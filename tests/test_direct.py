"""Direct-parquet scan path: equivalence with the DataFrame path and
hash-kind handling (sketchlib/spark/direct.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.core.hll import HyperLogLog
from sketchlib.core.kll import KLL
from sketchlib.core.tdigest import TDigest
from sketchlib.spark.aggregate import KIND_ARRAY, KIND_DOUBLE, KIND_HASH64, sketch_column
from sketchlib.spark.direct import list_parquet_files, sketch_parquet
from sketchlib.spark.datagen import token_sequences


@pytest.fixture(scope="module")
def token_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("direct") / "tokens")
    token_sequences(spark, 8_000, seed=3, partitions=8).write.parquet(path)
    return path


def test_list_files(token_path):
    files = list_parquet_files(token_path)
    assert len(files) >= 1
    assert all(f.endswith(".parquet") for f in files)


def test_direct_matches_dataframe_path(spark, token_path):
    direct = sketch_parquet(
        spark, token_path, "tokens", lambda: TDigest(delta=800), KIND_ARRAY
    )
    df = spark.read.parquet(token_path)
    via_df = sketch_column(df, "tokens", lambda: TDigest(delta=800), KIND_ARRAY)
    assert direct.count == via_df.count
    assert direct.min == via_df.min and direct.max == via_df.max
    qs = np.array([0.1, 0.5, 0.9])
    np.testing.assert_allclose(
        direct.value_at_quantile(qs), via_df.value_at_quantile(qs), rtol=0.01
    )


def test_direct_scalar_column(spark, token_path):
    sk = sketch_parquet(
        spark, token_path, "n_tok", lambda: KLL(k=128), KIND_DOUBLE
    )
    df = spark.read.parquet(token_path)
    assert sk.count == df.count()
    true = df.agg(F.expr("percentile(n_tok, 0.5)")).first()[0]
    assert abs(sk.value_at_quantile(0.5) - true) <= max(0.02 * true, 2.0)


def test_direct_hash_kind_int(spark, token_path):
    # hash64 on an int column uses numpy splitmix64 instead of JVM
    # xxhash64 — estimates must still hit the HLL bound
    sk = sketch_parquet(
        spark, token_path, "n_tok", lambda: HyperLogLog(p=12), KIND_HASH64
    )
    true = spark.read.parquet(token_path).select("n_tok").distinct().count()
    assert abs(sk.estimate() - true) / true <= 4 * sk.relative_std_error()


def test_cross_hash_domain_merge_refused(spark, token_path):
    """A direct-path HLL (numpy splitmix64) must REFUSE to merge with a
    DataFrame-path HLL (JVM xxhash64) — their register states live in
    different hash domains and a merged estimate would be silently
    wrong.  The guard rides the serialized header, so it also fires
    through serde.merge_blobs (the Spark merge stages)."""
    from sketchlib import serde
    from sketchlib.core.hashing import DOMAIN_SPLITMIX64, DOMAIN_XXHASH64

    direct = sketch_parquet(
        spark, token_path, "n_tok", lambda: HyperLogLog(p=12), KIND_HASH64
    )
    df = spark.read.parquet(token_path)
    via_df = sketch_column(df, "n_tok", lambda: HyperLogLog(p=12), KIND_HASH64)
    assert direct.hash_domain == DOMAIN_SPLITMIX64
    assert via_df.hash_domain == DOMAIN_XXHASH64
    with pytest.raises(ValueError, match="hash domain"):
        direct.merge(via_df)
    # and through the serialized-blob path the merge stages use
    with pytest.raises(ValueError, match="hash domain"):
        serde.merge_blobs([direct.to_bytes(), via_df.to_bytes()])
    # same-domain merges still work
    direct2 = sketch_parquet(
        spark, token_path, "n_tok", lambda: HyperLogLog(p=12), KIND_HASH64
    )
    direct.merge(direct2)
    rt = serde.from_bytes(direct.to_bytes())
    assert rt.hash_domain == DOMAIN_SPLITMIX64
    # SpaceSaving (the heavy-hitter state) is guarded too
    from sketchlib.core.spacesaving import SpaceSaving

    ss_d = sketch_parquet(
        spark, token_path, "n_tok", lambda: SpaceSaving(capacity=64),
        KIND_HASH64,
    )
    ss_j = sketch_column(
        df, "n_tok", lambda: SpaceSaving(capacity=64), KIND_HASH64
    )
    assert ss_d.hash_domain == DOMAIN_SPLITMIX64
    assert ss_j.hash_domain == DOMAIN_XXHASH64
    with pytest.raises(ValueError, match="hash domain"):
        ss_d.merge(ss_j)


def test_row_group_predicate_pushdown(spark, tmp_path):
    """Row-group pruning from parquet footer statistics: inside one
    kept file, groups outside the predicate range are never decoded.
    Verified with the pyarrow metadata counter (which groups exist,
    which are skipped) and by the sketch count covering exactly the
    kept groups' rows."""
    import pyarrow.parquet as pq

    from sketchlib.spark.direct import _prune_row_groups

    # one file, 10 row groups of 1000 rows: v in [0,1000), [1000,2000)…
    path = str(tmp_path / "rg.parquet")
    tbl = __import__("pyarrow").table(
        {"v": np.arange(10_000, dtype=np.float64)}
    )
    pq.write_table(tbl, path, row_group_size=1000)
    md = pq.ParquetFile(path).metadata
    assert md.num_row_groups == 10

    kept, skipped = _prune_row_groups(md, "v", 7500, None)
    assert skipped == 7 and kept == [7, 8, 9]
    kept, skipped = _prune_row_groups(md, "v", 2500, 4200)
    assert kept == [2, 3, 4] and skipped == 7
    # groups lacking stats for a missing column: conservatively kept
    kept, skipped = _prune_row_groups(md, "nope", 0, 1)
    assert skipped == 0 and len(kept) == 10

    # end-to-end: the sketch sees exactly the kept groups' rows
    sk = sketch_parquet(
        spark, path, "v", lambda: TDigest(delta=500), KIND_DOUBLE,
        prune=("v", 7500, None),
    )
    assert sk.count == 3000
    assert sk.min == 7000.0 and sk.max == 9999.0  # group granularity
    # a range matching nothing prunes every group -> empty build
    assert sketch_parquet(
        spark, path, "v", lambda: TDigest(delta=500), KIND_DOUBLE,
        prune=("v", 50_000, None),
    ) is None


def test_row_group_pruning_temporal_stats(tmp_path):
    """pyarrow surfaces timestamp/date statistics as datetime objects
    while Iceberg bounds are int micros/days — the row-group pruner
    must compare in the int domain instead of raising TypeError."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sketchlib.spark.direct import _prune_row_groups

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    ts = [base + dt.timedelta(hours=i) for i in range(40)]
    days = [dt.date(2024, 1, 1) + dt.timedelta(days=i) for i in range(40)]
    tbl = pa.table({
        "ts": pa.array(ts, pa.timestamp("us", tz="UTC")),
        "d": pa.array(days, pa.date32()),
    })
    path = str(tmp_path / "t.parquet")
    pq.write_table(tbl, path, row_group_size=10)
    md = pq.ParquetFile(path).metadata
    # micros bound at hour 25 -> groups 0-1 dropped... group2 contains it
    cut = int((base + dt.timedelta(hours=25)).timestamp() * 1_000_000)
    kept, skipped = _prune_row_groups(md, "ts", cut, None)
    assert kept == [2, 3] and skipped == 2
    # days since epoch bound at day 15 -> keep groups 1..3
    epoch_days = (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days + 15
    kept, skipped = _prune_row_groups(md, "d", epoch_days, None)
    assert kept == [1, 2, 3] and skipped == 1
    # incomparable predicate type: conservatively keep everything
    kept, skipped = _prune_row_groups(md, "ts", "not-a-time", None)
    assert skipped == 0 and len(kept) == 4


def test_iceberg_row_group_pruning(spark, tmp_path):
    """sketch_iceberg: the file-level predicate also reaches ROW-GROUP
    granularity inside kept files (field-id resolved to the column name
    through the table-metadata schema)."""
    import pyarrow.parquet as pq

    from sketchlib.iceberg.fixture import wrap_existing_parquet
    from sketchlib.spark.direct import sketch_iceberg

    # 2 files x 4 row groups of 250 rows each
    data = str(tmp_path / "raw")
    __import__("os").makedirs(data)
    paths = []
    for i in range(2):
        t = __import__("pyarrow").table(
            {
                "id": np.arange(i * 1000, (i + 1) * 1000, dtype=np.int64),
                "v": np.arange(i * 1000, (i + 1) * 1000, dtype=np.float64),
            }
        )
        p = f"{data}/part{i}.parquet"
        pq.write_table(t, p, row_group_size=250)
        paths.append(p)
    loc = str(tmp_path / "tbl")
    wrap_existing_parquet(loc, paths, stats_columns=["id", "v"])
    # id >= 1750: file 0 fully pruned (file bounds), file 1 keeps only
    # its last row group at row-group granularity -> 250 rows
    sk = sketch_iceberg(
        spark, loc, "v", lambda: TDigest(delta=500),
        prune_field_id=1, prune_min=1750,
    )
    assert sk.count == 250
    assert sk.min == 1750.0 and sk.max == 1999.0


def test_bincount_acc_uint64_band_and_budget():
    """Regression (self-review r3): uint64 values above 2^63 in a
    narrow band must accumulate (uint64-space subtraction), not crash
    the bincount cast; and a shared byte budget bounds TOTAL
    accumulator memory across many accs."""
    from sketchlib.spark.aggregate import _BincountAcc

    hi = np.uint64(2**63 + 10_000)
    vals = (hi + np.arange(1000, dtype=np.uint64) % np.uint64(64))
    acc = _BincountAcc()
    assert acc.try_add(vals)
    assert acc.items == 1000
    assert acc.counts.sum() == 1000
    # and the distinct-hash flush hashes the true uint64 values
    from sketchlib.core.hll import HyperLogLog
    from sketchlib.spark.aggregate import flush_hashed

    sk = HyperLogLog(p=10)
    n = flush_hashed(acc, sk, 2)
    assert n == 1000
    assert 40 <= sk.estimate() <= 90  # 64 distinct values

    # shared budget: second acc is denied once the budget is spent
    budget = [8 * 100]  # room for 100 int64 counts total
    a = _BincountAcc(budget)
    b = _BincountAcc(budget)
    assert a.try_add(np.arange(80, dtype=np.int64))
    assert not b.try_add(np.arange(1000, 1200, dtype=np.int64))  # needs 200
    assert b.try_add(np.arange(5, dtype=np.int64))  # 5 fits the remainder
    # flushing releases the budget for later accs
    from sketchlib.core.tdigest import TDigest

    a.flush_into(TDigest(delta=100))
    c = _BincountAcc(budget)
    assert c.try_add(np.arange(60, dtype=np.int64))


def test_direct_overlap_and_bounds_bit_identical(spark, tmp_path):
    """Round-4 decode-path work must not change results: the threaded
    decode/feed overlap and the footer-stat bounds hints both produce
    BIT-IDENTICAL serialized sketch states vs the inline loop, for the
    quantile path (t-digest over list<int32>) and the hash path (HLL)."""
    from sketchlib.core.hll import HyperLogLog
    from sketchlib.spark.aggregate import KIND_ARRAY, KIND_ARRAY_HASH
    from sketchlib.spark.direct import sketch_parquet

    path = str(tmp_path / "tok")
    rows = [
        (i, [int(x) for x in np.random.default_rng(i).integers(0, 999, 40)])
        for i in range(400)
    ]
    spark.createDataFrame(rows, "id long, tokens array<int>").repartition(
        4
    ).write.parquet(path)

    td = [
        sketch_parquet(
            spark, path, "tokens", lambda: TDigest(delta=500), KIND_ARRAY,
            overlap=ov,
        ).to_bytes()
        for ov in (True, False)
    ]
    assert td[0] == td[1]
    hll = [
        sketch_parquet(
            spark, path, "tokens", lambda: HyperLogLog(p=12),
            KIND_ARRAY_HASH, overlap=ov,
        ).to_bytes()
        for ov in (True, False)
    ]
    assert hll[0] == hll[1]

    # bounds hints vs per-batch min/max: same accumulated counts
    from sketchlib.spark.aggregate import _BincountAcc

    rng = np.random.default_rng(7)
    batches = [rng.integers(0, 999, 5000).astype(np.int32) for _ in range(5)]
    a, b = _BincountAcc(), _BincountAcc()
    for v in batches:
        assert a.try_add(v)
        assert b.try_add(v, 0, 998)  # conservative file bounds
    assert a.offset == b.offset == 0
    np.testing.assert_array_equal(
        a.counts, b.counts[: a.counts.size]
    )
    assert b.counts[a.counts.size:].sum() == 0

    # lying bounds degrade instead of corrupting: value above stated
    # max -> False, value below stated min (0-fast-path) -> False
    c = _BincountAcc()
    assert c.try_add(np.arange(10, dtype=np.int32), 0, 50)
    assert not c.try_add(np.array([60], dtype=np.int32), 0, 50)
    assert not c.try_add(np.array([-5], dtype=np.int32), 0, 50)
    assert c.counts.sum() == 10


def test_bincount_acc_mixed_signedness_degrades():
    """Advisor r3: one accumulator, batches of MIXED signedness — a
    uint64 batch after a negative-offset int64 batch (np.uint64(neg)
    raises OverflowError raw) and an int64 batch after a >2^63 uint64
    batch (int64 minus huge python int overflows) must return False
    (degrade to the per-batch feed) instead of crashing the task, and
    leave the already-accumulated counts intact."""
    from sketchlib.spark.aggregate import _BincountAcc

    # negative int64 offset, then a uint64 batch
    acc = _BincountAcc()
    assert acc.try_add(np.arange(-50, 50, dtype=np.int64))
    assert not acc.try_add(np.arange(10, 20, dtype=np.uint64))
    assert acc.items == 100 and acc.counts.sum() == 100
    assert acc.offset == -50

    # >2^63 uint64 offset, then an int64 batch whose range would fit
    hi = np.uint64(2**63 + 100)
    acc2 = _BincountAcc()
    assert acc2.try_add(hi + np.arange(10, dtype=np.uint64))
    assert not acc2.try_add(np.full(5, 2**63 - 1, dtype=np.int64))
    assert acc2.items == 10 and acc2.counts.sum() == 10


def test_direct_missing_path(spark):
    with pytest.raises(FileNotFoundError):
        sketch_parquet(
            spark, "/tmp/definitely-missing-dir-xyz", "c",
            lambda: TDigest(), KIND_DOUBLE,
        )


def test_xxhash64_numpy_bit_equal_jvm(spark):
    """Round 4: numpy XXH64 must be BIT-EQUAL to Spark's F.xxhash64 for
    integer columns — long columns via hashLong, int columns via
    hashInt (Spark hashes sub-int integrals through the 4-byte path)."""
    import random

    from sketchlib.core.hashing import xxhash64_i32, xxhash64_i64

    random.seed(3)
    longs = [0, 1, -1, 42, -42, 2**63 - 1, -(2**63)] + [
        random.randint(-(2**63), 2**63 - 1) for _ in range(200)
    ]
    jvm = np.array(
        [
            r["h"]
            for r in spark.createDataFrame([(v,) for v in longs], "v long")
            .select(F.xxhash64("v").alias("h"))
            .collect()
        ],
        dtype=np.int64,
    ).view(np.uint64)
    np.testing.assert_array_equal(jvm, xxhash64_i64(np.array(longs, dtype=np.int64)))

    ints = [0, 1, -1, 49_999, -(2**31), 2**31 - 1] + [
        random.randint(-(2**31), 2**31 - 1) for _ in range(200)
    ]
    jvm32 = np.array(
        [
            r["h"]
            for r in spark.createDataFrame([(int(v),) for v in ints], "v int")
            .select(F.xxhash64("v").alias("h"))
            .collect()
        ],
        dtype=np.int64,
    ).view(np.uint64)
    np.testing.assert_array_equal(jvm32, xxhash64_i32(np.array(ints, dtype=np.int32)))


def test_direct_xxhash64_mode_merges_with_dataframe_path(spark, tmp_path):
    """hash_compat='xxhash64': a direct-scan HLL must be REGISTER-
    IDENTICAL to the DataFrame path's KIND_HASH64 build over the same
    keys and merge with it; the default splitmix mode must still
    refuse the cross-domain merge."""
    from sketchlib.core.hll import HyperLogLog
    from sketchlib.spark.aggregate import (
        KIND_ARRAY,
        KIND_ARRAY_HASH,
        KIND_HASH64,
        sketch_column,
    )
    from sketchlib.spark.direct import sketch_parquet

    path = str(tmp_path / "tok")
    rows = [
        (1000 + i, [int(x) for x in np.random.default_rng(i).integers(0, 500, 30)])
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    df.repartition(4).write.parquet(path)
    back = spark.read.parquet(path)

    # scalar long column: direct xxhash64 == DataFrame KIND_HASH64
    jvm_hll = sketch_column(back, "doc_id", lambda: HyperLogLog(p=12), KIND_HASH64)
    xx_hll = sketch_parquet(
        spark, path, "doc_id", lambda: HyperLogLog(p=12), KIND_HASH64,
        hash_compat="xxhash64",
    )
    assert jvm_hll.to_bytes() == xx_hll.to_bytes()
    merged = HyperLogLog.from_bytes(jvm_hll.to_bytes()).merge(xx_hll)
    assert abs(merged.estimate() - 300) / 300 < 0.1

    # int32 token elements: direct xxhash64 == JVM hash of EXPLODED ints
    exploded = back.select(F.explode("tokens").alias("t"))
    jvm_tok = sketch_column(exploded, "t", lambda: HyperLogLog(p=12), KIND_HASH64)
    xx_tok = sketch_parquet(
        spark, path, "tokens", lambda: HyperLogLog(p=12), KIND_ARRAY_HASH,
        hash_compat="xxhash64",
    )
    assert jvm_tok.to_bytes() == xx_tok.to_bytes()

    # default splitmix mode still refuses the cross-domain merge
    sm = sketch_parquet(
        spark, path, "doc_id", lambda: HyperLogLog(p=12), KIND_HASH64,
    )
    with pytest.raises(ValueError, match="hash domains"):
        sm.merge(jvm_hll)


def test_xxhash64_strings_doubles_bit_equal_jvm(spark):
    """Vectorized XXH64 for StringType (UTF-8, full algorithm incl. the
    32-byte stripe path) and DoubleType (-0.0 normalized) must be
    BIT-EQUAL to F.xxhash64, and the direct path's xxhash64 mode must
    produce a byte-identical HLL to the DataFrame path over a STRING
    key column."""
    import random

    from sketchlib.core.hashing import xxhash64_f64, xxhash64_str

    random.seed(11)
    strs = ["", "a", "doc-000123", "x" * 31, "y" * 32, "z" * 33, "w" * 100,
            "üñïçødé-строка-日本語", "tab\tnl\n"] + [
        "".join(random.choice("abcdef012345-_") for _ in range(random.randint(0, 80)))
        for _ in range(300)
    ]
    jvm = np.array(
        [r["h"] for r in spark.createDataFrame([(s,) for s in strs], "v string")
         .select(F.xxhash64("v").alias("h")).collect()],
        dtype=np.int64,
    ).view(np.uint64)
    np.testing.assert_array_equal(jvm, xxhash64_str(strs))
    # arrow-buffer path gives the same answers as the python-list path
    import pyarrow as pa

    np.testing.assert_array_equal(xxhash64_str(pa.array(strs)), xxhash64_str(strs))

    dbls = [0.0, -0.0, 1.5, -1.5, 1e308, -1e-308, 3.141592653589793] + [
        random.uniform(-1e6, 1e6) for _ in range(100)
    ]
    jvmd = np.array(
        [r["h"] for r in spark.createDataFrame([(d,) for d in dbls], "v double")
         .select(F.xxhash64("v").alias("h")).collect()],
        dtype=np.int64,
    ).view(np.uint64)
    np.testing.assert_array_equal(jvmd, xxhash64_f64(np.array(dbls)))


def test_direct_xxhash64_string_column_merges(spark, tmp_path):
    from sketchlib.core.hll import HyperLogLog
    from sketchlib.spark.aggregate import KIND_HASH64, sketch_column
    from sketchlib.spark.direct import sketch_parquet

    path = str(tmp_path / "strkeys")
    rows = [(f"doc-{i:06d}",) for i in range(500)]
    spark.createDataFrame(rows, "doc_id string").repartition(4).write.parquet(path)
    jvm_hll = sketch_column(
        spark.read.parquet(path), "doc_id", lambda: HyperLogLog(p=12), KIND_HASH64
    )
    xx_hll = sketch_parquet(
        spark, path, "doc_id", lambda: HyperLogLog(p=12), KIND_HASH64,
        hash_compat="xxhash64",
    )
    assert jvm_hll.to_bytes() == xx_hll.to_bytes()
    merged = HyperLogLog.from_bytes(jvm_hll.to_bytes()).merge(xx_hll)
    assert abs(merged.estimate() - 500) / 500 < 0.1


def test_feed_uint64_dense_fast_path():
    """Review r4: np.bincount refuses uint64 (unsafe cast) — the dense
    non-negative fast path must widen that case instead of crashing."""
    from sketchlib.core.kll import KLL
    from sketchlib.spark.aggregate import _feed

    sk = KLL(k=128)
    n = _feed(sk, np.array([1, 2, 3, 100, 100], dtype=np.uint64))
    assert n == 5 and sk.count == 5


def test_bincount_acc_dtype_drift_degrades():
    """Review r4: a batch of a DIFFERENT integer width must not share
    the accumulator — the flush hashes at the source width (JVM
    hashInt vs hashLong differ) and a narrower cast could wrap."""
    from sketchlib.spark.aggregate import _BincountAcc

    acc = _BincountAcc()
    assert acc.try_add(np.arange(10, dtype=np.int32))
    assert not acc.try_add(np.arange(10, dtype=np.int64))
    assert acc.items == 10 and acc.src_dtype == np.int32


def test_bincount_acc_unsigned_corrupt_bounds_degrade():
    """Review r4: an unsigned batch below a corrupt (understated) vmin
    hint must degrade, not wrap into a multi-GB bincount."""
    from sketchlib.spark.aggregate import _BincountAcc

    acc = _BincountAcc()
    assert acc.try_add(np.arange(100, 110, dtype=np.uint32), 100, 200)
    # stats lie: actual value 5 < stated min 100
    assert not acc.try_add(np.array([5], dtype=np.uint32), 100, 200)
    assert acc.counts.sum() == 10


def test_file_bounds_wider_than_max_range_fall_back(spark, tmp_path):
    """Review r4: a file whose GLOBAL range exceeds MAX_RANGE but whose
    batches are locally narrow must still use the accumulator (hint
    dropped -> per-batch min/max), not reject every batch."""
    import pyarrow as paw
    import pyarrow.parquet as pq

    from sketchlib.core.hll import HyperLogLog
    from sketchlib.spark.aggregate import KIND_HASH64
    from sketchlib.spark.direct import sketch_parquet

    # two row groups: ids clustered near 0 and near 2^40
    vals = np.concatenate([
        np.arange(1000, dtype=np.int64),
        (1 << 40) + np.arange(1000, dtype=np.int64),
    ])
    path = str(tmp_path / "wide.parquet")
    pq.write_table(paw.table({"v": vals}), path, row_group_size=1000)
    sk = sketch_parquet(
        spark, path, "v", lambda: HyperLogLog(p=12), KIND_HASH64
    )
    assert abs(sk.estimate() - 2000) / 2000 < 0.1


def test_lineage_key_type_validated_early(spark, tmp_path):
    from sketchlib.core.kll import KLL
    from sketchlib.spark.aggregate import KIND_ARRAY
    from sketchlib.spark.checkpoint import run_checkpointed_direct

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, [1, 2]), (2, [3])], "doc_id long, tokens array<int>"
    ).write.parquet(path)
    with pytest.raises(TypeError, match="lineage key column"):
        run_checkpointed_direct(
            spark, path, "tokens", lambda: KLL(k=64),
            str(tmp_path / "ck"), "tokens", kind=KIND_ARRAY, n_lineage=4,
        )


def test_xxhash64_type_parity_matrix(spark, tmp_path):
    """Advisor r4 (medium): hash_compat='xxhash64' must be bit-equal to
    what the JVM computes for the Spark type each parquet physical type
    READS BACK AS — float32 via hashInt(floatToIntBits), uint32 via
    hashLong of the zero-extended value (Spark reads UINT_32 as
    LongType), uint8/16 via hashInt of the value — and must REJECT
    types with no JVM-parity hash (uint64 -> Decimal(20,0)) instead of
    silently corrupting a cross-engine merge."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sketchlib.core import hashing

    f32 = np.array(
        [0.0, -0.0, 1.5, -1.5, np.nan, np.inf, -np.inf, 3.25e-30, 1e30],
        dtype=np.float32,
    )
    # a non-canonical NaN payload: numpy .view preserves it, Java's
    # floatToIntBits / doubleToLongBits collapse it
    f32_odd_nan = np.array([0x7FC00001], dtype=np.int32).view(np.float32)
    f32 = np.concatenate([f32, f32_odd_nan])
    f64 = f32.astype(np.float64)
    f64[-1] = np.array([0x7FF8000000000001], dtype=np.int64).view(np.float64)[0]
    tbl = pa.table(
        {
            "f32": pa.array(f32, type=pa.float32()),
            "f64": pa.array(f64, type=pa.float64()),
            "u8": pa.array(np.array([0, 1, 200, 255, 17, 3, 4, 5, 6, 7], np.uint8)),
            "u16": pa.array(
                np.array([0, 1, 60000, 65535, 1234, 9, 8, 7, 6, 5], np.uint16)
            ),
            "u32": pa.array(
                np.array(
                    [0, 1, 2**31, 2**32 - 1, 123456789, 42, 7, 9, 11, 13],
                    np.uint32,
                )
            ),
        }
    )
    path = str(tmp_path / "typed.parquet")
    pq.write_table(tbl, path)
    back = spark.read.parquet(path)
    # Spark's read schema: u8 -> short, u16 -> int, u32 -> long
    assert dict(back.dtypes)["u32"] == "bigint"
    jvm = back.select(
        *[F.xxhash64(c).alias(c) for c in ("f32", "f64", "u8", "u16", "u32")]
    ).collect()

    def col(name):
        return np.array([r[name] for r in jvm], dtype=np.int64).view(np.uint64)

    np.testing.assert_array_equal(col("f32"), hashing.xxhash64_f32(f32))
    np.testing.assert_array_equal(col("f64"), hashing.xxhash64_f64(f64))
    np.testing.assert_array_equal(
        col("u8"), hashing.xxhash64_ints(tbl["u8"].to_numpy())
    )
    np.testing.assert_array_equal(
        col("u16"), hashing.xxhash64_ints(tbl["u16"].to_numpy())
    )
    np.testing.assert_array_equal(
        col("u32"), hashing.xxhash64_ints(tbl["u32"].to_numpy())
    )
    with pytest.raises(TypeError, match="uint64"):
        hashing.xxhash64_ints(np.array([1, 2], dtype=np.uint64))
    with pytest.raises(ValueError, match="null"):
        hashing.xxhash64_str(pa.array(["a", None, "b"]))


def test_direct_xxhash64_float32_column_merges(spark, tmp_path):
    """End-to-end: a float32 parquet column sketched by the direct
    engine in xxhash64 mode produces a byte-identical HLL to the
    DataFrame path (F.xxhash64 on the FloatType column)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    vals = rng.normal(size=2000).astype(np.float32)
    path = str(tmp_path / "f32keys")
    import os

    os.makedirs(path)
    pq.write_table(
        pa.table({"v": pa.array(vals)}), os.path.join(path, "part0.parquet")
    )
    jvm_hll = sketch_column(
        spark.read.parquet(path), "v", lambda: HyperLogLog(p=12), KIND_HASH64
    )
    xx_hll = sketch_parquet(
        spark, path, "v", lambda: HyperLogLog(p=12), KIND_HASH64,
        hash_compat="xxhash64",
    )
    assert jvm_hll.to_bytes() == xx_hll.to_bytes()
