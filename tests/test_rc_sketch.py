"""Fixed-capacity RCSketch: accuracy bars from
/root/reference/src/rc_sketch/rc_sketch.rs (k=200 at n=1e6, ascending
and descending adversaries, k=8 small-n rank bars, fast-compaction
variants at k=315/320) plus merge behavior."""

import numpy as np
import pytest

from sketchlib.core.oracle import LinearOracle
from sketchlib.core.rc_sketch import AVERAGE_NEIGHBOUR, KEEP_HALF, RCSketch
from tests.conftest import make_values


def rel_err(est, true):
    true = np.asarray(true, dtype=float)
    denom = np.where(np.abs(true) < 1e-12, 1.0, np.abs(true))
    return np.abs(np.asarray(est) - true) / denom


@pytest.mark.parametrize("order", ["ascending", "descending"])
def test_small_n_rank_bars(order):
    # rc_sketch.rs:319-360: k=8, n=1000, +/-10 mid-rank, +/-30 max
    vals = make_values(order, 1000)
    sk = RCSketch(input_length=1000, k=8)
    sk.add_buffer(vals)
    srt = np.sort(vals)
    assert sk.rank(srt[0]) == 1  # low ranks protected -> exact
    for probe_rank in (100, 250, 500, 750, 900):
        assert abs(sk.rank(srt[probe_rank - 1]) - probe_rank) <= 10
    assert abs(sk.rank(srt[-1]) - 1000) <= 30


@pytest.mark.parametrize("dist", ["uniform", "ascending", "descending"])
def test_1m_accuracy_k200(dist):
    # rc_sketch.rs:412-459: rel err <= 0.005 both directions at k=200
    values = make_values(dist, 1_000_000)
    sk = RCSketch(input_length=1_000_000, k=200)
    sk.add_buffer(values)
    oracle = LinearOracle(values)
    qs = np.array([0.001, 0.01, 0.25, 0.5, 0.75, 0.99, 0.999])
    est = sk.value_at_quantile(qs)
    true = oracle.values_at_quantiles(qs)
    assert np.all(rel_err(est, true) <= 0.005), (dist, rel_err(est, true))
    probes = oracle.values_at_quantiles(np.array([0.1, 0.5, 0.9]))
    est_q = sk.quantile_at_value(probes)
    true_q = oracle.quantiles_at_values(probes)
    assert np.all(np.abs(est_q - true_q) <= 0.005)


@pytest.mark.parametrize("k,method", [(315, KEEP_HALF), (320, AVERAGE_NEIGHBOUR)])
def test_fast_compaction_variants(k, method):
    # rc_sketch.rs:510-607: fast mode at k=315/320
    values = make_values("uniform", 1_000_000)
    sk = RCSketch(input_length=1_000_000, k=k, fast=True, method=method)
    sk.add_buffer(values)
    oracle = LinearOracle(values)
    qs = np.array([0.01, 0.25, 0.5, 0.75, 0.99])
    est = sk.value_at_quantile(qs)
    true = oracle.values_at_quantiles(qs)
    assert np.all(rel_err(est, true) <= 0.005), rel_err(est, true)


def test_merge_meets_serial_epsilon():
    values = make_values("uniform", 400_000)
    parts = np.array_split(values, 8)
    sks = []
    for i, p in enumerate(parts):
        s = RCSketch(input_length=p.size, k=200, seed=i)
        s.add_buffer(p)
        sks.append(s)
    merged = sks[0]
    for s in sks[1:]:
        merged.merge(s)
    oracle = LinearOracle(values)
    qs = np.array([0.01, 0.25, 0.5, 0.75, 0.99])
    est = merged.value_at_quantile(qs)
    true = oracle.values_at_quantiles(qs)
    assert np.all(rel_err(est, true) <= 0.01)
    assert merged.count == 400_000


def test_average_neighbour_weight_conservation():
    values = make_values("uniform", 100_000)
    sk = RCSketch(input_length=100_000, k=50, method=AVERAGE_NEIGHBOUR)
    sk.add_buffer(values)
    total = sum(lv.size * (1 << h) for h, lv in enumerate(sk.levels))
    assert total == 100_000  # averaging halves count but doubles weight


def test_serde_roundtrip():
    sk = RCSketch(input_length=50_000, k=64, seed=5, fast=True,
                  method=AVERAGE_NEIGHBOUR)
    sk.add_buffer(make_values("tan", 50_000))
    blob = sk.to_bytes()
    sk2 = RCSketch.from_bytes(blob)
    assert sk2.to_bytes() == blob
    qs = np.array([0.1, 0.5, 0.9])
    np.testing.assert_array_equal(sk.value_at_quantile(qs), sk2.value_at_quantile(qs))
    from sketchlib import serde

    assert isinstance(serde.from_bytes(blob), RCSketch)
