"""t-digest accuracy + merge-law tests.

Epsilons mirror the reference's strictest assertions at n=1e6
(/root/reference/src/t_digest/t_digest.rs:749-784: rel. err of
value-at-quantile <= 0.005 for mid quantiles at delta=2000, <= 0.01 at
q=0.001; rank direction t_digest.rs:800-835).  Merge equivalence
mirrors par_t_digest.rs:141-255: a parallel/partitioned build must meet
the same epsilon as a serial build.
"""

import numpy as np
import pytest

from sketchlib.core.oracle import LinearOracle
from sketchlib.core.tdigest import TDigest
from tests.conftest import make_values

MID_Q = [0.01, 0.25, 0.5, 0.75, 0.99]
TAIL_Q = [0.001, 0.999]


def rel_err(est, true):
    true = np.asarray(true, dtype=float)
    denom = np.where(np.abs(true) < 1e-12, 1.0, np.abs(true))
    return np.abs(np.asarray(est) - true) / denom


@pytest.mark.parametrize("scale", ["k1", "k2"])
def test_uniform_1m_accuracy(scale):
    values = make_values("uniform", 1_000_000)
    d = TDigest(delta=2000, scale=scale)
    d.add_buffer(values)
    oracle = LinearOracle(values)
    est = d.value_at_quantile(np.array(MID_Q))
    true = oracle.values_at_quantiles(MID_Q)
    assert np.all(rel_err(est, true) <= 0.005), rel_err(est, true)
    est_t = d.value_at_quantile(np.array(TAIL_Q))
    true_t = oracle.values_at_quantiles(TAIL_Q)
    assert np.all(rel_err(est_t, true_t) <= 0.01), rel_err(est_t, true_t)


def test_uniform_rank_direction():
    values = make_values("uniform", 1_000_000)
    d = TDigest(delta=2000, scale="k1")
    d.add_buffer(values)
    oracle = LinearOracle(values)
    probes = np.array([1.0, 10.0, 100.0, 250.0, 500.0, 750.0, 900.0, 1000.0])
    est = d.quantile_at_value(probes)
    true = oracle.quantiles_at_values(probes)
    # t_digest.rs:800-835 asserts <= 0.0005-0.0075 rel err across probes
    assert np.all(np.abs(est - true) <= 0.0075), np.abs(est - true)


@pytest.mark.parametrize("dist", ["ascending", "descending", "tan",
                                  "reverse_exponential", "growing_blocks"])
def test_adversarial_distributions(dist):
    values = make_values(dist, 200_000)
    d = TDigest(delta=2000, scale="k2")
    d.add_buffer(values)
    oracle = LinearOracle(values)
    qs = np.array(MID_Q)
    est = d.value_at_quantile(qs)
    true = oracle.values_at_quantiles(qs)
    # rank-space check is the right metric for heavy-tailed dists:
    # the estimated value must sit within 1% of rank of the true value
    back = oracle.quantiles_at_values(est)
    assert np.all(np.abs(back - qs) <= 0.01), (dist, np.abs(back - qs))
    # and for the benign dists value-space accuracy also holds
    if dist in ("ascending", "descending"):
        assert np.all(rel_err(est, true) <= 0.005)


def test_exact_quartiles_ascending_small():
    # t_digest.rs:697-713: ascending 0..1001, quartiles within +/- 2
    values = np.arange(1001, dtype=float)
    d = TDigest(delta=2000, scale="k1")
    d.add_buffer(values)
    for q in (0.25, 0.5, 0.75):
        assert abs(d.value_at_quantile(q) - q * 1000) <= 2.0


def test_singleton_exactness():
    # t_digest.rs:934-949 / parallel_digest.rs:291-310: tiny sets are
    # exact at the centroid centers
    vals = [1.0, 2.0, 8.0, 0.5]
    d = TDigest(delta=2000, scale="k2")
    d.add_buffer(np.array(vals))
    for i, v in enumerate(sorted(vals)):
        q = (i + 0.5) / len(vals)
        assert d.value_at_quantile(q) == pytest.approx(v)
    assert d.value_at_quantile(0.0) == 0.5
    assert d.value_at_quantile(1.0) == 8.0


def test_min_max_count():
    values = make_values("uniform", 10_000)
    d = TDigest(delta=500)
    d.add_buffer(values)
    assert d.min == values.min()
    assert d.max == values.max()
    assert d.count == 10_000
    assert d.n_centroids < 1200  # bounded memory


def test_merge_matches_serial():
    # par_t_digest.rs:141-255: partitioned build meets serial epsilon
    values = make_values("uniform", 400_000)
    parts = np.array_split(values, 16)
    digests = [TDigest(delta=2000, scale="k2") for _ in parts]
    for d, p in zip(digests, parts):
        d.add_buffer(p)
    merged = digests[0]
    for d in digests[1:]:
        merged.merge(d)
    oracle = LinearOracle(values)
    est = merged.value_at_quantile(np.array(MID_Q))
    true = oracle.values_at_quantiles(MID_Q)
    assert np.all(rel_err(est, true) <= 0.005)
    assert merged.count == 400_000
    assert merged.min == values.min()
    assert merged.max == values.max()


def test_merge_associative_commutative():
    # merge-law property: random tree shapes & shuffled orders give
    # estimates within epsilon of each other (t-digest is order-
    # sensitive at the bit level; the law holds at the accuracy level)
    rng = np.random.default_rng(7)
    values = make_values("uniform", 100_000)
    parts = np.array_split(values, 8)

    def build(order, tree_seed):
        ds = []
        for i in order:
            d = TDigest(delta=1000, scale="k2")
            d.add_buffer(parts[i])
            ds.append(d)
        r = np.random.default_rng(tree_seed)
        while len(ds) > 1:
            i, j = sorted(r.choice(len(ds), 2, replace=False))
            ds[i].merge(ds.pop(j))
        return ds[0]

    qs = np.array([0.01, 0.1, 0.5, 0.9, 0.99])
    base = build(list(range(8)), 0).value_at_quantile(qs)
    for trial in range(4):
        order = rng.permutation(8)
        est = build(list(order), trial + 1).value_at_quantile(qs)
        assert np.all(rel_err(est, base) <= 0.01)


def test_merge_identity():
    values = make_values("uniform", 10_000)
    d = TDigest(delta=500)
    d.add_buffer(values)
    before = d.value_at_quantile(np.array([0.1, 0.5, 0.9]))
    d.merge(TDigest(delta=500))  # zero sketch
    after = d.value_at_quantile(np.array([0.1, 0.5, 0.9]))
    np.testing.assert_allclose(before, after)
    assert d.count == 10_000


def test_weighted_add_equivalent():
    # pre-aggregated duplicates build == raw build (token fast path)
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 500, 50_000)
    d1 = TDigest(delta=1000)
    d1.add_buffer(raw.astype(float))
    vals, counts = np.unique(raw, return_counts=True)
    d2 = TDigest(delta=1000)
    d2.add_weighted(vals.astype(float), counts.astype(float))
    qs = np.linspace(0.05, 0.95, 19)
    e1 = d1.value_at_quantile(qs)
    e2 = d2.value_at_quantile(qs)
    oracle = LinearOracle(raw.astype(float))
    true = oracle.values_at_quantiles(qs)
    assert np.all(np.abs(e1 - true) <= 2.0)
    assert np.all(np.abs(e2 - true) <= 2.0)


def test_serde_roundtrip():
    values = make_values("tan", 50_000)
    d = TDigest(delta=800, scale="k1")
    d.add_buffer(values)
    blob = d.to_bytes()
    d2 = TDigest.from_bytes(blob)
    assert d2.delta == d.delta and d2.scale == d.scale
    np.testing.assert_array_equal(d2.means, d.means)
    np.testing.assert_array_equal(d2.weights, d.weights)
    assert (d2.min, d2.max) == (d.min, d.max)
    assert d.owned_size() == len(blob)
