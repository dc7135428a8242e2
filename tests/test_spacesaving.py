"""SpaceSaving heavy hitters: published guarantees (items with count >
N/m are tracked; per-counter error <= N/m), merge preservation, and the
distributed top-k path."""

import numpy as np
import pytest

from sketchlib.core.hashing import hash_i64
from sketchlib.core.spacesaving import SpaceSaving


def _zipf_stream(n, n_keys, seed=0):
    rng = np.random.default_rng(seed)
    return rng.zipf(1.2, n) % n_keys


def test_heavy_hitters_guarantee():
    keys = _zipf_stream(200_000, 5000)
    true = np.bincount(keys, minlength=5000)
    ss = SpaceSaving(capacity=256)
    ss.add_hashes(hash_i64(keys))
    assert ss.total == 200_000
    thresh = ss.guaranteed_min_count()
    tracked = {h for h, _, _ in ss.top_k(256)}
    for k in np.flatnonzero(true > thresh):
        assert int(hash_i64(np.array([k]))[0]) in tracked, k
    # per-counter overestimate bounded: est in [true, true + N/m]
    probe = np.flatnonzero(true > thresh)[:20]
    est = ss.estimate_hashes(hash_i64(probe))
    for e, t in zip(est, true[probe]):
        assert t <= e <= t + thresh


def test_exact_when_under_capacity():
    keys = np.repeat(np.arange(50), [i + 1 for i in range(50)])
    ss = SpaceSaving(capacity=256)
    ss.add_hashes(hash_i64(keys))
    est = ss.estimate_hashes(hash_i64(np.arange(50)))
    np.testing.assert_array_equal(est, np.arange(1, 51))
    assert all(e == 0 for _, _, e in ss.top_k(50))  # no evictions -> exact


def test_weighted_add():
    ss = SpaceSaving(capacity=8)
    ss.add_hashes(hash_i64(np.array([1, 2])), counts=np.array([100, 5]))
    top = ss.top_k(2)
    assert top[0][1] == 100 and top[1][1] == 5
    assert ss.total == 105


def test_merge_preserves_guarantee():
    keys = _zipf_stream(300_000, 3000, seed=3)
    true = np.bincount(keys, minlength=3000)
    parts = np.array_split(keys, 8)
    merged = None
    for i, p in enumerate(parts):
        s = SpaceSaving(capacity=256)
        s.add_hashes(hash_i64(p))
        merged = s if merged is None else merged.merge(s)
    assert merged.total == 300_000
    thresh = merged.total / merged.capacity
    tracked = {h for h, _, _ in merged.top_k(256)}
    heavy = np.flatnonzero(true > 2 * thresh)  # comfortably heavy
    for k in heavy:
        assert int(hash_i64(np.array([k]))[0]) in tracked, k
    # estimates never undercount by more than the tracked error
    for h, est, err in merged.top_k(20):
        # find true count for this hash
        match = [t for k, t in enumerate(true) if int(hash_i64(np.array([k]))[0]) == h]
        if match:
            assert est >= match[0]
            assert est - err <= match[0]


def test_serde_roundtrip():
    ss = SpaceSaving(capacity=64)
    ss.add_hashes(hash_i64(_zipf_stream(50_000, 500)))
    blob = ss.to_bytes()
    rt = SpaceSaving.from_bytes(blob)
    assert rt.to_bytes() == blob or (
        rt.counts == ss.counts and rt.errors == ss.errors and rt.total == ss.total
    )
    from sketchlib import serde

    assert isinstance(serde.from_bytes(blob), SpaceSaving)


def test_spark_distributed_topk(spark):
    from sketchlib.spark.aggregate import KIND_HASH64, sketch_column

    keys = _zipf_stream(40_000, 1000, seed=7)
    df = spark.createDataFrame([(int(k),) for k in keys], "k long").repartition(8)
    ss = sketch_column(df, "k", lambda: SpaceSaving(capacity=256), KIND_HASH64)
    assert ss.total == 40_000
    # top-5 by SpaceSaving matches exact top-5 (identity = xxhash64)
    from pyspark.sql import functions as F

    exact = (
        df.groupBy("k").count().orderBy(F.desc("count"), F.asc("k")).limit(5)
    )
    exact_hashed = {
        r["h"] % (1 << 64): r["count"]  # signed JVM long -> uint64 key
        for r in exact.select(F.xxhash64("k").alias("h"), "count").collect()
    }
    top = {h: c for h, c, _ in ss.top_k(10)}
    for h, true_cnt in exact_hashed.items():
        assert h in top
        assert top[h] >= true_cnt
