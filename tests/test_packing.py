"""Sequence packing and stratified sampling (round 5 pipeline
operators: sketchlib/spark/api.pack_sequences / sample_stratified)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.spark.api import pack_sequences, sample_stratified


@pytest.fixture(scope="module")
def docs_df(spark):
    rng = np.random.default_rng(9)
    rows = [
        (int(i), ["web", "code", "wiki"][i % 3], int(rng.integers(1, 900)))
        for i in range(500)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, n_tok long")


def _expected_layout(rows, L, key=None):
    """Recompute the packing rule in plain python: concatenate in
    doc_id order (optionally per group), chunk at L."""
    out = {}
    prior = {}
    for did, grp, nt in sorted(rows):
        g = grp if key else None
        p = prior.get(g, 0)
        out[did] = (p // L, p % L, (p % L + nt - 1) // L + 1)
        prior[g] = p + nt
    return out


def test_pack_sequences_exact_layout(spark, docs_df):
    L = 2048
    got = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"], r["n_seqs"])
        for r in pack_sequences(docs_df, L, order_col="doc_id").collect()
    }
    rows = [(r["doc_id"], r["source"], r["n_tok"]) for r in docs_df.collect()]
    assert got == _expected_layout(rows, L)
    # layout invariants: offsets in range, first doc at (0, 0), token
    # stream is gapless (total span == ceil(total_tokens / L))
    total = sum(nt for _, _, nt in rows)
    last = max(got.values(), key=lambda v: (v[0], v[1]))
    assert got[min(got)] == (0, 0, got[min(got)][2])
    assert all(0 <= off < L for _, off, _ in got.values())
    n_seqs_total = (total + L - 1) // L
    assert max(sid + ns - 1 for sid, _, ns in got.values()) == n_seqs_total - 1


def test_pack_sequences_grouped(spark, docs_df):
    L = 1024
    got = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"], r["n_seqs"])
        for r in pack_sequences(
            docs_df, L, order_col="doc_id", group_col="source"
        ).collect()
    }
    rows = [(r["doc_id"], r["source"], r["n_tok"]) for r in docs_df.collect()]
    assert got == _expected_layout(rows, L, key="grp")


def test_pack_sequences_bucketed_identity(spark, docs_df):
    """The two-phase prefix-sum plan must produce the identical layout
    for any bucket count, on numeric and hash orders, global and
    grouped (gate defeated so the bucketed plan itself runs)."""
    for kwargs in (
        {"order_col": "doc_id"},
        {"order_col": "doc_id", "group_col": "source"},
        {},
    ):
        base = None
        for nb in (1, 7, 64, 1024):
            got = {
                r["doc_id"]: (r["seq_id"], r["seq_offset"], r["n_seqs"])
                for r in pack_sequences(
                    docs_df, 2048, order_buckets=nb,
                    bucketed_min_partitions=0, **kwargs
                ).collect()
            }
            if base is None:
                base = got
            assert got == base, (kwargs, nb)


def test_pack_sequences_drops_empty_docs_and_validates(spark):
    df = spark.createDataFrame(
        [(1, "s", 10), (2, "s", 0), (3, "s", 5)],
        "doc_id long, source string, n_tok long",
    )
    got = pack_sequences(df, 8, order_col="doc_id").collect()
    assert sorted(r["doc_id"] for r in got) == [1, 3]
    by = {r["doc_id"]: r for r in got}
    # doc 1 spans seqs 0-1 (10 tokens at offset 0, L=8); doc 3 starts
    # at global position 10 => seq 1 offset 2
    assert (by[1]["seq_id"], by[1]["seq_offset"], by[1]["n_seqs"]) == (0, 0, 2)
    assert (by[3]["seq_id"], by[3]["seq_offset"], by[3]["n_seqs"]) == (1, 2, 1)
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(df, 0)


def test_sample_stratified_deterministic_and_calibrated(spark):
    n = 20_000
    df = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3]) for i in range(n)],
        "doc_id long, grp string",
    )
    fr = {"a": 0.5, "b": 0.125}
    got = sample_stratified(df, ["grp"], fr, key_cols=["doc_id"], seed=3)
    rows = got.collect()
    ids = {r["doc_id"] for r in rows}
    # unlisted stratum dropped entirely (default_fraction=0)
    assert all(r["grp"] != "c" for r in rows)
    # deterministic: same seed -> same selection; different seed differs
    again = {
        r["doc_id"]
        for r in sample_stratified(
            df, ["grp"], fr, key_cols=["doc_id"], seed=3
        ).collect()
    }
    other = {
        r["doc_id"]
        for r in sample_stratified(
            df, ["grp"], fr, key_cols=["doc_id"], seed=4
        ).collect()
    }
    assert ids == again and ids != other
    # calibration: observed rate within 5 sigma of the target
    by = {"a": 0, "b": 0}
    for r in rows:
        by[r["grp"]] += 1
    for g, f in fr.items():
        n_g = n // 3 + (1 if g == "a" else 0)
        sigma = (n_g * f * (1 - f)) ** 0.5
        assert abs(by[g] - n_g * f) < 5 * sigma, (g, by[g], n_g * f)
    # subset stability: the same rows are picked from HALF the data
    half = df.filter(F.col("doc_id") < n // 2)
    sub = {
        r["doc_id"]
        for r in sample_stratified(
            half, ["grp"], fr, key_cols=["doc_id"], seed=3
        ).collect()
    }
    assert sub == {i for i in ids if i < n // 2}


def test_sample_stratified_multi_column_strata_and_validation(spark):
    df = spark.createDataFrame(
        [(i, "s%d" % (i % 2), "l%d" % (i % 3)) for i in range(3000)],
        "doc_id long, src string, lang string",
    )
    got = sample_stratified(
        df, ["src", "lang"], {("s0", "l0"): 1.0, ("s1", "l1"): 0.25},
        key_cols=["doc_id"],
    ).collect()
    combos = {(r["src"], r["lang"]) for r in got}
    assert combos <= {("s0", "l0"), ("s1", "l1")}
    # fraction 1.0 keeps every row of its stratum
    n00 = sum((i % 2, i % 3) == (0, 0) for i in range(3000))
    assert sum(1 for r in got if (r["src"], r["lang"]) == ("s0", "l0")) == n00
    with pytest.raises(ValueError, match="fraction"):
        sample_stratified(df, ["src"], {"s0": 1.5})


def test_sample_stratified_pushdown_filter_in_plan(spark, tmp_path):
    """default_fraction=0 single-column strata: the stratum isin must
    reach the parquet scan so unlisted strata never leave the source."""
    path = str(tmp_path / "strat")
    spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3]) for i in range(300)],
        "doc_id long, grp string",
    ).write.parquet(path)
    out = sample_stratified(
        spark.read.parquet(path), ["grp"], {"a": 0.5}, key_cols=["doc_id"]
    )
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pushed = plan.split("PushedFilters:")[1].split("\n")[0]
    assert "In(grp" in pushed or "EqualTo(grp,a)" in pushed, plan


def test_sample_stratified_typed_strata_bool_and_null(spark):
    """Review r5: stratum matching must compare in the COLUMN's type —
    a string-cast match silently missed bool strata (python str(True)
    = 'True' vs Spark 'true'); eqNullSafe makes None matchable."""
    df = spark.createDataFrame(
        [(i, "s%d" % (i % 2), bool(i % 2)) for i in range(2000)]
        + [(9000 + i, None, True) for i in range(200)],
        "doc_id long, src string, flag boolean",
    )
    got = sample_stratified(
        df, ["src", "flag"], {("s1", True): 1.0}, key_cols=["doc_id"]
    ).collect()
    assert len(got) == 1000  # every (s1, true) row kept
    assert all(r["src"] == "s1" and r["flag"] for r in got)
    # None as a stratum key value matches via eqNullSafe
    got_null = sample_stratified(
        df, ["src", "flag"], {(None, True): 1.0}, key_cols=["doc_id"]
    ).collect()
    assert len(got_null) == 200
    assert all(r["src"] is None for r in got_null)


def test_budget_sampling_array_order_col_single_window_fallback(spark):
    """Review r5: a complex-typed order column (orderable by Spark,
    unhashable in python) must fall back to the single-window plan
    instead of crashing in the sampled-bounds path."""
    from sketchlib.spark.api import sample_by_token_budget

    df = spark.createDataFrame(
        [(i, "s", 10, [i % 5, i]) for i in range(100)],
        "doc_id long, source string, n_tok long, okey array<int>",
    )
    got = sample_by_token_budget(
        df, {"s": 200}, order_col="okey", bucketed_min_partitions=0
    ).collect()
    # prefix rule over (i%5, i) lexicographic order: 20 docs of 10 toks
    order = sorted(range(100), key=lambda i: (i % 5, i))
    assert {r["doc_id"] for r in got} == set(order[:20])


def test_pack_sequences_integer_div_near_2_63(spark):
    """Review r5: seq_id must come from integer division — double
    division breaks above 2^53 cumulative tokens.  Feed a prior sum
    beyond 2^53 via one huge document and check exact layout."""
    big = (1 << 55) + 3  # cumulative sum passes 2^53
    df = spark.createDataFrame(
        [(1, big), (2, 7), (3, 11)], "doc_id long, n_tok long"
    )
    L = 2048
    got = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"], r["n_seqs"])
        for r in pack_sequences(df, L, order_col="doc_id").collect()
    }
    p2 = big
    p3 = big + 7
    assert got[1] == (0, 0, (big - 1) // L + 1)
    assert got[2] == (p2 // L, p2 % L, (p2 % L + 7 - 1) // L + 1)
    assert got[3] == (p3 // L, p3 % L, (p3 % L + 11 - 1) // L + 1)


def test_materialize_packed_exact_windows(spark):
    from sketchlib.spark.api import materialize_packed

    rng = np.random.default_rng(5)
    rows = [
        (int(i), [int(x) for x in rng.integers(0, 1000, rng.integers(1, 40))])
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, toks array<int>")
    L = 32
    got = {
        r["seq_id"]: (r["n_tokens"], r["tokens"])
        for r in materialize_packed(df, "toks", L, order_col="doc_id").collect()
    }
    stream = [t for _, ts in sorted(rows) for t in ts]
    expect = {
        w: stream[w * L : (w + 1) * L]
        for w in range((len(stream) + L - 1) // L)
    }
    assert set(got) == set(expect)
    for w, toks in expect.items():
        assert got[w] == (len(toks), toks), w
    # every window but the last is exactly L long
    full = [w for w in got if got[w][0] == L]
    assert len(full) >= len(got) - 1


def test_materialize_packed_grouped_and_bucketed_identity(spark):
    from sketchlib.spark.api import materialize_packed

    rng = np.random.default_rng(6)
    rows = [
        (int(i), ["g0", "g1"][i % 2],
         [int(x) for x in rng.integers(0, 99, rng.integers(1, 20))])
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp string, toks array<int>")
    base = None
    for nb in (1, 16, 512):
        got = {
            (r["grp"], r["seq_id"]): r["tokens"]
            for r in materialize_packed(
                df, "toks", 16, order_col="doc_id", group_col="grp",
                order_buckets=nb, bucketed_min_partitions=0,
            ).collect()
        }
        if base is None:
            base = got
        assert got == base, nb
    # per-group stream recompute
    for g in ("g0", "g1"):
        stream = [t for i, gg, ts in sorted(rows) if gg == g for t in ts]
        for w in range((len(stream) + 15) // 16):
            assert base[(g, w)] == stream[w * 16 : (w + 1) * 16], (g, w)


def test_vocabulary_doc_frequency(spark):
    from sketchlib.text.analysis import vocabulary

    df = spark.createDataFrame(
        [(1, "a b b c"), (2, "b c d"), (3, "c e"), (4, "")],
        "doc_id long, text string",
    )
    got = {r["term"]: r["doc_freq"] for r in vocabulary(df, "text").collect()}
    assert got == {"a": 1, "b": 2, "c": 3, "d": 1, "e": 1}
    got2 = {r["term"]: r["doc_freq"]
            for r in vocabulary(df, "text", min_df=2).collect()}
    assert got2 == {"b": 2, "c": 3}
    # tokens=True over array input
    adf = spark.createDataFrame(
        [(1, ["x", "y", "x"]), (2, ["y"])], "doc_id long, toks array<string>"
    )
    got3 = {r["term"]: r["doc_freq"]
            for r in vocabulary(adf, "toks", tokens=True).collect()}
    assert got3 == {"x": 1, "y": 2}
