"""High-tail accuracy path: HighTailView + approx_quantiles(tail=).

The relative compactor protects rank 0 (ACCURACY.md §7); tail="high"
negates the build so p99.9-class quantiles get the protected-side
accuracy at 1x state.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.core.kll import KLL
from sketchlib.core.wrappers import HighTailView
from sketchlib.spark.api import approx_quantiles


def _rel_rank_err(vals, est, q):
    sv = np.sort(vals)
    n = len(sv)
    r_est = np.searchsorted(sv, est, side="right")
    tail_mass = max(min(q * n, (1 - q) * n), 1.0)
    return abs(r_est - q * n) / tail_mass


def test_view_flips_queries_exactly():
    rng = np.random.default_rng(3)
    v = rng.exponential(100.0, 200_000)
    neg = KLL(k=200, seed=9)
    neg.add_buffer(-v)
    view = HighTailView(neg)
    # identical to querying the negated sketch by hand
    for q in (0.5, 0.99, 0.999):
        assert view.value_at_quantile(q) == -neg.value_at_quantile(1.0 - q)
    assert view.count == len(v)
    # vectorized form matches scalars
    got = view.value_at_quantile(np.array([0.5, 0.999]))
    assert got[0] == view.value_at_quantile(0.5)
    assert got[1] == view.value_at_quantile(0.999)
    # rank flips around count
    x = float(np.quantile(v, 0.9))
    assert view.rank(x) == pytest.approx(len(v) - neg.rank(-x))


def test_high_tail_accuracy_beats_default():
    rng = np.random.default_rng(11)
    v = rng.exponential(1000.0, 1_000_000)
    lo, hi = KLL(k=200, seed=5), KLL(k=200, seed=5)
    lo.add_buffer(v)
    hi.add_buffer(-v)
    view = HighTailView(hi)
    q = 0.9999
    err_default = _rel_rank_err(v, lo.value_at_quantile(q), q)
    err_high = _rel_rank_err(v, view.value_at_quantile(q), q)
    # protected side: within ~6% of the tail mass; unprotected side is
    # off by multiples of it
    assert err_high <= 0.06, err_high
    assert err_default > 1.0, err_default


def test_view_merge_matches_serial():
    rng = np.random.default_rng(13)
    a, b = rng.normal(0, 1, 150_000), rng.normal(0, 1, 150_000)
    va = HighTailView(_neg_kll(a))
    vb = HighTailView(_neg_kll(b))
    serial = HighTailView(_neg_kll(np.concatenate([a, b])))
    va.merge(vb)
    both = np.concatenate([a, b])
    for q in (0.99, 0.999):
        em = _rel_rank_err(both, va.value_at_quantile(q), q)
        es = _rel_rank_err(both, serial.value_at_quantile(q), q)
        assert em <= max(3 * es, 0.05), (q, em, es)
    assert va.count == len(both)


def _neg_kll(v, k=200, seed=7):
    sk = KLL(k=k, seed=seed)
    sk.add_buffer(-np.asarray(v))
    return sk


def test_spark_tail_high_scalar_and_array(spark):
    n = 60_000
    df = spark.range(n).select(
        (F.pow(F.pmod(F.xxhash64("id"), 100_000) / 100_000.0, 4.0) * 1000.0)
        .alias("v")
    )
    vals = np.array([r["v"] for r in df.collect()])
    (est,), view = approx_quantiles(df, "v", [0.999], sketch="kll", tail="high", k=200)
    assert _rel_rank_err(vals, est, 0.999) <= 0.25
    assert view.count == n
    # array column path
    adf = spark.range(5_000).select(
        F.array(
            *[
                F.pmod(F.xxhash64("id", F.lit(i)), 1000).cast("double")
                for i in range(8)
            ]
        ).alias("a")
    )
    flat = np.array([x for r in adf.collect() for x in r["a"]])
    (est_a,), _ = approx_quantiles(
        adf, "a", [0.99], sketch="kll", is_array=True, tail="high", k=200
    )
    assert _rel_rank_err(flat, est_a, 0.99) <= 0.25


def test_tail_high_rejected_for_tdigest(spark):
    df = spark.range(10).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError, match="tail-symmetric"):
        approx_quantiles(df, "v", [0.5], sketch="tdigest", tail="high")
    with pytest.raises(ValueError, match="tail must be"):
        approx_quantiles(df, "v", [0.5], sketch="kll", tail="upper")


def test_view_inclusive_rank_on_ties():
    """Discrete values tie constantly; rank/quantile_at_value must stay
    INCLUSIVE (#{x <= v}) through the negation."""
    v = np.full(1000, 5.0)
    view = HighTailView(_neg_kll(v))
    assert view.rank(5.0) == 1000
    assert view.quantile_at_value(5.0) == pytest.approx(1.0)
    assert view.rank(4.999) == 0
    assert view.quantile_at_value(4.999) == pytest.approx(0.0)
    # mixed atoms: 600 fives + 400 sevens
    v2 = np.concatenate([np.full(600, 5.0), np.full(400, 7.0)])
    view2 = HighTailView(_neg_kll(v2))
    assert view2.rank(5.0) == 600
    assert view2.rank(6.0) == 600
    assert view2.rank(7.0) == 1000
