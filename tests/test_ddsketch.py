"""DDSketch unit + property tests.

The guarantee under test (Masson et al., VLDB 2019, Thm. 2.1): for any
quantile q, the estimate is within ``alpha`` RELATIVE error of the data
item at the queried rank — checked here against the true rank item
(both floor and ceil of q*(n-1), since the sketch may legitimately land
on either side of a rank tie)."""

from __future__ import annotations

import numpy as np
import pytest

from sketchlib import serde
from sketchlib.core.ddsketch import DDSketch

QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999]


def _assert_relative(sk: DDSketch, data: np.ndarray, alpha: float):
    s = np.sort(data)
    n = s.size
    for q in QS:
        est = sk.value_at_quantile(q)
        r = q * (n - 1)
        cands = [s[int(np.floor(r))], s[int(np.ceil(r))]]
        ok = any(
            abs(est - x) <= alpha * abs(x) + 1e-12 for x in cands
        )
        assert ok, f"q={q}: est={est} not within {alpha} of {cands}"


@pytest.mark.parametrize("alpha", [0.01, 0.05])
def test_relative_error_lognormal(alpha):
    rng = np.random.default_rng(7)
    data = rng.lognormal(mean=4.0, sigma=2.0, size=200_000)
    sk = DDSketch(alpha=alpha)
    sk.add_buffer(data)
    assert sk.count == data.size
    _assert_relative(sk, data, alpha)


def test_relative_error_with_negatives_and_zeros():
    rng = np.random.default_rng(11)
    data = np.concatenate(
        [
            -rng.lognormal(2.0, 1.5, 30_000),
            np.zeros(5_000),
            rng.lognormal(3.0, 1.5, 65_000),
        ]
    )
    rng.shuffle(data)
    sk = DDSketch(alpha=0.02)
    sk.add_buffer(data)
    _assert_relative(sk, data, 0.02)
    # min/max are exact, and extreme quantiles clamp to them
    assert sk.min == data.min() and sk.max == data.max()
    assert sk.value_at_quantile(0.0) >= sk.min
    assert sk.value_at_quantile(1.0) <= sk.max


def test_nan_dropped_and_empty():
    sk = DDSketch()
    assert np.isnan(sk.value_at_quantile(0.5))
    sk.add_buffer(np.array([np.nan, np.nan]))
    assert sk.count == 0
    sk.add_buffer(np.array([np.nan, 3.0]))
    assert sk.count == 1
    assert sk.value_at_quantile(0.5) == pytest.approx(3.0, rel=0.011)


def test_merge_commutative_associative_bitexact():
    """With no collapse, merge must be BIT-exact commutative and
    associative (integer counts in float64; symmetric store union)."""
    rng = np.random.default_rng(3)
    parts = [
        rng.lognormal(3.0, 2.0, 10_000) * sign
        for sign in (1, -1, 1)
    ]

    def build(chunks):
        sk = DDSketch(alpha=0.01, max_bins=100_000)
        for c in chunks:
            sk.add_buffer(c)
        return sk

    a, b, c = (build([p]) for p in parts)
    ab_c = build([parts[0]]).merge(build([parts[1]])).merge(build([parts[2]]))
    a_bc = build([parts[0]]).merge(build([parts[1]]).merge(build([parts[2]])))
    ba = build([parts[1]]).merge(build([parts[0]])).merge(build([parts[2]]))
    direct = build(parts)
    assert ab_c.to_bytes() == a_bc.to_bytes() == ba.to_bytes()
    assert ab_c.to_bytes() == direct.to_bytes()


def test_merge_alpha_mismatch_raises():
    with pytest.raises(ValueError, match="alpha"):
        DDSketch(alpha=0.01).merge(DDSketch(alpha=0.02))
    with pytest.raises(TypeError):
        DDSketch().merge(object())


def test_collapse_bounds_memory_preserves_tail():
    rng = np.random.default_rng(5)
    data = rng.lognormal(0.0, 3.0, 500_000)  # huge dynamic range
    sk = DDSketch(alpha=0.01, max_bins=512)
    for chunk in np.array_split(data, 20):
        sk.add_buffer(chunk)
    assert sk.pos_idx.size + sk.neg_idx.size <= 512
    assert sk.collapsed
    assert sk.count == data.size  # mass never lost
    # the guarantee holds for every quantile ABOVE the collapsed
    # (lowest-value) mass: derive that boundary from the sketch — the
    # collapse bin is the lowest kept bucket, so anything above the
    # SECOND-lowest bucket's lower edge is uncollapsed territory
    import math

    log_gamma = sk._log_gamma
    lower_edge = math.exp((sk.pos_idx[1] - 1) * log_gamma)
    frac_below = float(np.mean(data <= lower_edge))
    s = np.sort(data)
    n = s.size
    checked = 0
    for q in [0.5, 0.9, 0.99, 0.999]:
        if q < frac_below + 0.01:
            continue
        checked += 1
        est = sk.value_at_quantile(q)
        r = q * (n - 1)
        cands = [s[int(np.floor(r))], s[int(np.ceil(r))]]
        assert any(abs(est - x) <= 0.01 * abs(x) + 1e-12 for x in cands)
    assert checked >= 1  # the tail contract is actually exercised


def test_weighted_equals_repeated():
    vals = np.array([1.5, -2.25, 0.0, 7.0, 1.5])
    wts = np.array([3, 1, 2, 4, 2], dtype=np.int64)
    a = DDSketch(alpha=0.01)
    a.add_weighted(vals, wts)
    b = DDSketch(alpha=0.01)
    b.add_buffer(np.repeat(vals, wts))
    assert a.to_bytes() == b.to_bytes()
    with pytest.raises(ValueError):
        DDSketch().add_weighted([1.0], [1.0, 2.0])
    with pytest.raises(ValueError):
        DDSketch().add_weighted([1.0], [-1.0])


def test_serde_roundtrip_and_registry():
    rng = np.random.default_rng(9)
    sk = DDSketch(alpha=0.03, max_bins=256)
    sk.add_buffer(rng.normal(0.0, 100.0, 50_000))
    blob = serde.to_bytes(sk)
    back = serde.from_bytes(blob)
    assert isinstance(back, DDSketch)
    assert back.to_bytes() == sk.to_bytes()
    assert back.value_at_quantile(0.9) == sk.value_at_quantile(0.9)
    assert serde.KINDS["ddsketch"] is DDSketch
    # merge via the kind-agnostic blob path
    merged = serde.from_bytes(serde.merge_blobs([blob, blob]))
    assert merged.count == 2 * sk.count


def test_rank_and_quantile_at_value():
    data = np.arange(1.0, 10_001.0)
    sk = DDSketch(alpha=0.01)
    sk.add_buffer(data)
    for v in [1.0, 100.0, 5000.0, 10_000.0]:
        q = sk.quantile_at_value(v)
        assert q == pytest.approx(v / 10_000.0, abs=0.015)
    assert sk.est_quantile_at_value(10_500.0) == pytest.approx(1.0, abs=1e-9)
    assert sk.est_value_at_quantile(0.5) == pytest.approx(5000.0, rel=0.011)


def test_param_validation():
    with pytest.raises(ValueError):
        DDSketch(alpha=0.0)
    with pytest.raises(ValueError):
        DDSketch(alpha=1.0)
    with pytest.raises(ValueError):
        DDSketch(max_bins=1)


def test_merge_into_empty_does_not_alias_other():
    """Regression: _merge_store's empty-side early exit used to return
    the OTHER sketch's arrays by reference; a later _collapse on self
    then mutated them in place, corrupting the other sketch."""
    rng = np.random.default_rng(11)
    b = DDSketch(alpha=0.01, max_bins=4096)
    b.add_buffer(rng.lognormal(3.0, 2.0, 3000))
    b_bytes = b.to_bytes()
    b_count = b.count

    a = DDSketch(alpha=0.01, max_bins=64)  # tiny: merge WILL collapse
    a.merge(b)
    assert a.count == b_count
    # b must be untouched: bytes identical, counts still consistent
    assert b.to_bytes() == b_bytes
    assert float(b.pos_cnt.sum() + b.neg_cnt.sum() + b.zero_count) == b_count
