"""Mergeable reservoir sample: uniformity (KS-style), determinism,
merge correctness, distributed path."""

import numpy as np
import pytest

from sketchlib.core.reservoir import ReservoirSample


def test_exact_under_capacity():
    r = ReservoirSample(capacity=100)
    vals = np.arange(50, dtype=float)
    r.add_buffer(vals)
    np.testing.assert_array_equal(np.sort(r.sample()), vals)
    assert r.count == 50


def test_uniformity_over_stream():
    # sample mean/quantiles of a U[0,1000) stream approximate the source
    r = ReservoirSample(capacity=2000, seed=1)
    rng = np.random.default_rng(0)
    for _ in range(20):
        r.add_buffer(rng.uniform(0, 1000, 50_000))
    s = r.sample()
    assert s.size == 2000
    assert r.count == 1_000_000
    assert abs(s.mean() - 500) < 25  # 3 sigma ~ 3*288/sqrt(2000) = 19
    assert abs(np.quantile(s, 0.5) - 500) < 40


def test_order_bias_absent():
    # ascending stream: sample quantiles must track the full range,
    # not the tail (classic reservoir failure mode)
    r = ReservoirSample(capacity=1000, seed=3)
    r.add_buffer(np.arange(500_000, dtype=float))
    s = r.sample()
    assert np.quantile(s, 0.5) == pytest.approx(250_000, rel=0.1)
    assert s.min() < 50_000 and s.max() > 450_000


def test_merge_uniform_over_union():
    a = ReservoirSample(capacity=1000, seed=5)
    b = ReservoirSample(capacity=1000, seed=6)
    a.add_buffer(np.random.default_rng(1).uniform(0, 100, 300_000))
    b.add_buffer(np.random.default_rng(2).uniform(100, 200, 100_000))
    a.merge(b)
    assert a.count == 400_000
    s = a.sample()
    # ~25% of the union is from b's range
    frac_b = (s >= 100).mean()
    assert abs(frac_b - 0.25) < 0.06


def test_deterministic():
    def build():
        r = ReservoirSample(capacity=64, seed=9)
        r.add_buffer(np.arange(10_000, dtype=float))
        return r.to_bytes()

    assert build() == build()


def test_serde():
    from sketchlib import serde

    r = ReservoirSample(capacity=32, seed=2)
    r.add_buffer(np.random.default_rng(0).uniform(0, 1, 1000))
    rt = serde.from_bytes(r.to_bytes())
    assert isinstance(rt, ReservoirSample)
    np.testing.assert_array_equal(np.sort(rt.sample()), np.sort(r.sample()))
    assert rt.count == 1000


def test_distributed_sample(spark):
    from sketchlib.spark.aggregate import KIND_DOUBLE, sketch_column

    vals = np.random.default_rng(0).uniform(0, 1000, 80_000)
    df = spark.createDataFrame([(float(v),) for v in vals], "v double").repartition(8)
    r = sketch_column(
        df, "v", lambda: ReservoirSample(capacity=2000, seed=11), KIND_DOUBLE
    )
    assert r.count == 80_000
    s = r.sample()
    assert s.size == 2000
    assert abs(np.quantile(s, 0.5) - 500) < 40


def test_same_seed_partitions_independent_keys():
    # Regression: keys must depend on the data, not just (seed, local
    # index) — otherwise P same-seed partition builders emit identical
    # key streams and the merged bottom-k selects the same ~cap/P
    # stream POSITIONS from every partition (collapsing effective
    # sample size for position-correlated shards).
    P, n, cap = 8, 10_000, 2000
    rng = np.random.default_rng(0)
    parts = []
    for p in range(P):
        r = ReservoirSample(capacity=cap, seed=11)  # same seed, as the
        r.add_buffer(rng.uniform(p, p + 1, n))      # spark factory does
        parts.append(r)
    acc = parts[0]
    for r in parts[1:]:
        acc.merge(r)
    vals = acc.sample()
    assert vals.size == cap
    # recover each sampled item's within-partition stream position by
    # rebuilding the per-partition streams
    rng = np.random.default_rng(0)
    positions = set()
    for p in range(P):
        stream = rng.uniform(p, p + 1, n)
        sel = np.isin(stream, vals)
        positions.update(np.nonzero(sel)[0].tolist())
    # uniform selection over 8 partitions of 10k: ~1800 distinct
    # positions expected; the correlated-key bug yields exactly cap/P=250
    assert len(positions) > 1200, len(positions)
    # and the sample still covers all partitions roughly evenly
    share = np.bincount(vals.astype(int), minlength=P) / cap
    assert share.min() > 0.06 and share.max() < 0.20


def test_replicated_shards_decorrelated():
    """Regression (advisor r2): two same-seed builders over an
    IDENTICAL shard (same values at the same local positions) must emit
    independent key streams — the partition salt de-correlates them so
    the merged bottom-k treats the copies as distinct stream items
    rather than jointly including/excluding each duplicate pair."""
    vals = np.random.default_rng(7).uniform(0, 1, 4000)
    a = ReservoirSample(capacity=1000, seed=11, salt=1)
    b = ReservoirSample(capacity=1000, seed=11, salt=2)
    a.add_buffer(vals)
    b.add_buffer(vals)
    assert not np.array_equal(np.sort(a.keys), np.sort(b.keys))
    a.merge(b)
    # correlated keys would keep every survivor twice (500 distinct);
    # independent keys keep ~ 1000 * (1 - 1000/2... ) well above that
    distinct = np.unique(a.sample()).size
    assert distinct > 650, distinct
    # and the salt round-trips through serde
    from sketchlib import serde

    rt = serde.from_bytes(a.to_bytes())
    assert rt.salt == a.salt


def test_merge_associative_exact():
    # bottom-k merge is exactly associative/commutative on the state
    import itertools

    parts = [np.random.default_rng(i).uniform(0, 100, 5000) for i in range(3)]

    def build(order):
        rs = []
        for i in order:
            r = ReservoirSample(capacity=128, seed=100 + i)
            r.add_buffer(parts[i])
            rs.append(r)
        acc = rs[0]
        for r in rs[1:]:
            acc.merge(r)
        # exclude the seed header (it follows the first operand); the
        # selected (key, value) set must be identical
        return (tuple(np.sort(acc.keys).tolist()),
                tuple(np.sort(acc.values).tolist()), acc.count)

    states = {build(list(o)) for o in itertools.permutations(range(3))}
    assert len(states) == 1  # bottom-k selection is exactly order-free
