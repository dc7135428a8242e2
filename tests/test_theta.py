"""KMV/theta sketch: distinct estimate (RSE bound), set-operation
estimates, exact merge laws, and the corpus-overlap Spark path."""

import numpy as np
import pytest

from sketchlib.core.hashing import hash_i64
from sketchlib.core.theta import ThetaSketch


def _sk(lo, hi, k=4096, seed=1):
    t = ThetaSketch(k=k)
    t.add_hashes(hash_i64(np.arange(lo, hi), seed=seed))
    return t


def test_distinct_estimate_bound():
    for n in (100, 10_000, 500_000):
        t = _sk(0, n)
        rse = t.relative_std_error()
        assert abs(t.estimate() - n) / n <= 4 * rse, (n, t.estimate())


def test_exact_below_capacity():
    t = _sk(0, 1000)
    assert t.estimate() == 1000.0
    assert t.theta == 1.0


def test_set_operations():
    # A = [0, 60k), B = [40k, 100k): |A∩B| = 20k, |A∪B| = 100k
    a = _sk(0, 60_000)
    b = _sk(40_000, 100_000)
    rse = 4 * a.relative_std_error()
    assert abs(a.intersect_estimate(b) - 20_000) / 20_000 <= 2 * rse
    assert abs(a.union_estimate(b) - 100_000) / 100_000 <= rse
    assert abs(a.jaccard_estimate(b) - 0.2) <= 0.05
    assert abs(a.difference_estimate(b) - 40_000) / 40_000 <= 2 * rse


def test_disjoint_and_identical():
    a = _sk(0, 50_000)
    b = _sk(100_000, 150_000)
    assert a.intersect_estimate(b) / 50_000 <= 0.01
    c = _sk(0, 50_000)
    assert abs(a.jaccard_estimate(c) - 1.0) <= 0.01


def test_self_intersection_matches_estimate():
    """Estimator-convention consistency: the intersection sample uses
    STRICT < against the cut, so intersect(A, A) == estimate(A),
    jaccard(A, A) == 1.0 exactly, and difference(A, A) == 0.0 without
    relying on the clamp."""
    a = _sk(0, 200_000)  # well above capacity -> theta < 1
    assert a.theta < 1.0
    assert a.intersect_estimate(a) == pytest.approx(a.estimate())
    assert a.jaccard_estimate(a) == pytest.approx(1.0)
    assert a.estimate() - a.intersect_estimate(a) == pytest.approx(0.0)
    # and jaccard can never exceed 1 between different sketches either
    b = _sk(0, 200_000, seed=2)
    assert a.jaccard_estimate(b) <= 1.0


def test_merge_laws_exact_state():
    a = _sk(0, 30_000)
    b = _sk(20_000, 60_000)
    c = _sk(50_000, 90_000)

    def m(order):
        acc = ThetaSketch(k=4096)
        for s in order:
            acc.merge(s)
        return acc.hashes.tobytes()

    assert m([a, b, c]) == m([c, a, b]) == m([b, c, a])
    # idempotent
    aa = ThetaSketch(k=4096)
    aa.merge(a)
    aa.merge(a)
    np.testing.assert_array_equal(aa.hashes, a.hashes)


def test_serde():
    from sketchlib import serde

    t = _sk(0, 20_000)
    rt = serde.from_bytes(t.to_bytes())
    assert isinstance(rt, ThetaSketch)
    np.testing.assert_array_equal(rt.hashes, t.hashes)


def test_corpus_overlap_spark(spark):
    from pyspark.sql import functions as F

    from sketchlib.spark.api import corpus_overlap

    a = spark.range(0, 30_000).select(
        F.format_string("doc-%08d", F.col("id")).alias("doc_id")
    )
    b = spark.range(20_000, 50_000).select(
        F.format_string("doc-%08d", F.col("id")).alias("doc_id")
    )
    rep = corpus_overlap(a, b, "doc_id", k=4096)
    assert abs(rep["distinct_a"] - 30_000) / 30_000 <= 0.07
    assert abs(rep["intersection"] - 10_000) / 10_000 <= 0.15
    assert abs(rep["jaccard"] - 0.2) <= 0.05
    assert abs(rep["a_minus_b"] - 20_000) / 20_000 <= 0.15


def test_overlap_matrix_spark(spark):
    """3 groups with known pairwise overlaps, one scan: every pair's
    distinct/intersection/jaccard estimate lands within sketch error,
    pairs come out (group_a < group_b)-ordered and exhaustive."""
    from pyspark.sql import functions as F

    from sketchlib.spark.api import overlap_matrix

    # A = [0, 30k), B = [20k, 50k), C = [45k, 55k)
    spans = {"a": (0, 30_000), "b": (20_000, 50_000), "c": (45_000, 55_000)}
    parts = [
        spark.range(lo, hi).select(
            F.lit(g).alias("src"),
            F.format_string("doc-%08d", F.col("id")).alias("key"),
        )
        for g, (lo, hi) in spans.items()
    ]
    df = parts[0].union(parts[1]).union(parts[2]).repartition(8)
    out = overlap_matrix(df, "src", "key", k=4096).collect()
    assert [(r["group_a"], r["group_b"]) for r in out] == [
        ("a", "b"), ("a", "c"), ("b", "c"),
    ]
    exact = {("a", "b"): 10_000, ("a", "c"): 0, ("b", "c"): 5_000}
    sizes = {g: hi - lo for g, (lo, hi) in spans.items()}
    for r in out:
        pair = (r["group_a"], r["group_b"])
        assert abs(r["distinct_a"] - sizes[pair[0]]) / sizes[pair[0]] <= 0.07
        assert abs(r["distinct_b"] - sizes[pair[1]]) / sizes[pair[1]] <= 0.07
        want = exact[pair]
        if want == 0:
            assert r["intersection"] <= 300  # near-zero, no false mass
        else:
            assert abs(r["intersection"] - want) / want <= 0.2
        uni = sizes[pair[0]] + sizes[pair[1]] - want
        assert abs(r["union"] - uni) / uni <= 0.07
        assert abs(r["jaccard"] - want / uni) <= 0.05


def test_overlap_matrix_single_group(spark):
    """One group -> no pairs, but a well-formed empty frame."""
    from pyspark.sql import functions as F

    from sketchlib.spark.api import overlap_matrix

    df = spark.range(100).select(
        F.lit("only").alias("src"), F.col("id").alias("key")
    )
    out = overlap_matrix(df, "src", "key")
    assert out.columns == [
        "group_a", "group_b", "distinct_a", "distinct_b",
        "intersection", "union", "jaccard", "rse",
    ]
    assert out.count() == 0


def test_overlap_matrix_token_arrays(spark):
    """is_array=True: per-group sets are the distinct TOKENS of the
    group's sequences (the pre-tokenized training-sequence shape).
    Groups with engineered token-range overlap must estimate within
    sketch error; token arrays never explode into a row shuffle."""
    from pyspark.sql import functions as F

    from sketchlib.spark.api import overlap_matrix

    # src a: tokens [0, 20k); src b: tokens [10k, 30k) -> 10k overlap
    def seqs(name, lo, hi, n_docs=2000):
        per = (hi - lo) // n_docs
        return spark.range(n_docs).select(
            F.lit(name).alias("source"),
            F.expr(
                f"transform(sequence(0, {per - 1}), "
                f"j -> cast({lo} + id * {per} + j AS INT))"
            ).alias("tokens"),
        )

    df = seqs("a", 0, 20_000).union(seqs("b", 10_000, 30_000)).repartition(8)
    out = overlap_matrix(df, "source", "tokens", k=4096, is_array=True).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["group_a"], r["group_b"]) == ("a", "b")
    assert abs(r["distinct_a"] - 20_000) / 20_000 <= 0.07
    assert abs(r["distinct_b"] - 20_000) / 20_000 <= 0.07
    assert abs(r["intersection"] - 10_000) / 10_000 <= 0.2
    assert abs(r["jaccard"] - 1 / 3) <= 0.05


def test_overlap_matrix_distributed_parity(spark):
    """Above driver_max_groups the pairwise algebra moves into a
    blocked executor-side stage — it must return EXACTLY the driver
    path's values (same ThetaSketch algebra per pair), just computed
    with flat driver RSS; the states cache is bounded and releasable."""
    import pytest
    from pyspark.sql import functions as F

    from sketchlib.spark import api
    from sketchlib.spark.api import overlap_matrix, release_overlap_cache

    # 12 groups over sliding integer ranges -> plenty of real overlaps
    df = (
        spark.range(60_000)
        .select(
            F.concat(F.lit("s"), (F.col("id") % 12).cast("string")).alias("src"),
            (F.col("id") % 7_000).alias("key"),
        )
        .repartition(8)
    )
    drv = overlap_matrix(df, "src", "key", k=512).collect()
    assert api._get_overlap_cache().held is None  # driver path holds nothing
    dist = overlap_matrix(
        df, "src", "key", k=512, driver_max_groups=4, target_block=3
    )
    got = dist.collect()
    assert api._get_overlap_cache().held is not None
    assert [tuple(r) for r in got] == [tuple(r) for r in drv]
    assert len(got) == 12 * 11 // 2
    release_overlap_cache()
    assert api._get_overlap_cache().held is None

    # single group through the distributed path: well-formed empty frame
    one = spark.range(100).select(
        F.lit("only").alias("src"), F.col("id").alias("key")
    )
    assert overlap_matrix(one, "src", "key", driver_max_groups=0).count() == 0
    release_overlap_cache()

    # the assumed-small-G contract fails loudly (advisor r6)
    with pytest.raises(ValueError, match="max_groups"):
        overlap_matrix(df, "src", "key", k=512, max_groups=5)


def test_exact_mode_set_algebra_property():
    """Below k the retained hashes ARE the (hashed) sets, so every
    set-operation estimate must be digit-exact against python sets —
    randomized over overlap layouts, duplicates, and empty sides."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ids = st.lists(st.integers(min_value=0, max_value=5_000), max_size=400)

    @settings(max_examples=60, deadline=None)
    @given(ids, ids)
    def check(a_ids, b_ids):
        sa, sb = set(a_ids), set(b_ids)
        a = ThetaSketch(k=8192)
        b = ThetaSketch(k=8192)
        if a_ids:
            a.add_hashes(hash_i64(np.array(a_ids, dtype=np.int64), seed=1))
        if b_ids:
            b.add_hashes(hash_i64(np.array(b_ids, dtype=np.int64), seed=1))
        assert a.estimate() == float(len(sa))
        assert a.intersect_estimate(b) == float(len(sa & sb))
        assert a.union_estimate(b) == float(len(sa | sb))
        assert a.difference_estimate(b) == float(len(sa - sb))
        if sa or sb:
            assert a.jaccard_estimate(b) == pytest.approx(
                len(sa & sb) / len(sa | sb)
            )
        # merge == union, state-exactly
        m = ThetaSketch(k=8192)
        m.merge(a).merge(b)
        assert m.estimate() == float(len(sa | sb))

    check()
