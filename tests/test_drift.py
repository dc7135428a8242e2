"""Snapshot-drift operators: token_freq_drift, ks_2sample,
freq_spectrum — verified against driver-side exact recomputation."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.spark.drift import ks_2sample, token_freq_drift
from sketchlib.text.analysis import freq_spectrum


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(13)
    words = [f"w{i}" for i in range(50)]
    # zipf-ish draw so there are real heavy hitters
    p = 1.0 / np.arange(1, 51)
    p /= p.sum()
    rows = [
        (i, " ".join(rng.choice(words, size=rng.integers(3, 30), p=p)))
        for i in range(400)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string").cache()


def _py_counts(df):
    c = Counter()
    for r in df.collect():
        c.update(w for w in r["text"].split(" ") if w)
    return c


def test_token_freq_drift_exact(docs):
    a = docs
    b = docs.filter(F.col("doc_id") % 10 != 0)
    out = token_freq_drift(a, b, "text", k=15).collect()
    ca, cb = _py_counts(a), _py_counts(b)
    ta, tb = sum(ca.values()), sum(cb.values())
    expect = sorted(
        (
            (abs(ca[t] * tb - cb[t] * ta), t)
            for t in set(ca) | set(cb)
        ),
        key=lambda x: (-x[0], x[1]),
    )[:15]
    got = [(r["drift_num"], r["token"]) for r in out]
    assert got == expect
    for r in out:
        assert r["count_a"] == ca[r["token"]]
        assert r["count_b"] == cb[r["token"]]
        assert r["total_a"] == ta and r["total_b"] == tb


def test_token_freq_drift_spacesaving_backend(docs):
    """Sketch backend: exact totals, and the top drifted tokens match
    the exact backend (heavy drifters are frequent somewhere, so the
    SS tracked sets contain them; capacity is ample here -> counts are
    exact by the SpaceSaving guarantee)."""
    a = docs
    b = docs.filter(F.col("doc_id") % 3 == 0)
    exact = token_freq_drift(a, b, "text", k=5).collect()
    est = token_freq_drift(
        a, b, "text", k=5, backend="spacesaving",
        candidates=64, capacity=4096,
    ).collect()
    assert [r["token"] for r in est] == [r["token"] for r in exact]
    assert [r["drift_num"] for r in est] == [r["drift_num"] for r in exact]


def test_token_freq_drift_validation(docs):
    with pytest.raises(ValueError, match="backend"):
        token_freq_drift(docs, docs, "text", backend="nope")
    with pytest.raises(ValueError, match="k"):
        token_freq_drift(docs, docs, "text", k=0)


def _ks_numpy(x: np.ndarray, y: np.ndarray) -> int:
    vals = np.unique(np.concatenate([x, y]))
    ca = np.searchsorted(np.sort(x), vals, side="right")
    cb = np.searchsorted(np.sort(y), vals, side="right")
    return int(np.max(np.abs(y.size * ca - x.size * cb)))


@pytest.mark.parametrize("buckets", [0, 8])
def test_ks_2sample_matches_numpy(spark, buckets):
    rng = np.random.default_rng(5)
    x = rng.normal(0, 1, 4000)
    y = rng.normal(0.3, 1.2, 3000)
    da = spark.createDataFrame([(float(v),) for v in x], "value double")
    db = spark.createDataFrame([(float(v),) for v in y], "value double")
    row = ks_2sample(
        da, db, "value",
        order_buckets=buckets,
        bucketed_min_partitions=1 if buckets else 10**9,
    ).first()
    assert row["n_a"] == 4000 and row["n_b"] == 3000
    assert row["d_num"] == _ks_numpy(x, y)
    assert row["d"] == pytest.approx(row["d_num"] / (4000 * 3000))


def test_ks_2sample_identical_and_disjoint(spark):
    d = spark.range(500).select((F.col("id") % 97).cast("double").alias("v"))
    assert ks_2sample(d, d, "v").first()["d_num"] == 0
    lo = spark.range(100).select((F.col("id")).cast("double").alias("v"))
    hi = spark.range(100).select((F.col("id") + 1000).cast("double").alias("v"))
    row = ks_2sample(lo, hi, "v").first()
    assert row["d"] == 1.0


def test_ks_2sample_nulls_nans_dropped(spark):
    da = spark.createDataFrame(
        [(1.0,), (2.0,), (None,), (float("nan"),)], "value double"
    )
    db = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    row = ks_2sample(da, db, "value", col_b="v").first()
    assert row["n_a"] == 2 and row["n_b"] == 2 and row["d_num"] == 0


def test_freq_spectrum(docs):
    got = {
        r["occurrences"]: r["n_terms"]
        for r in freq_spectrum(docs, "text").collect()
    }
    counts = Counter(_py_counts(docs).values())
    assert got == dict(counts)
    # tokens=True path over a pre-tokenized array column
    arr = docs.select(F.split("text", " ").alias("toks"))
    got2 = {
        r["occurrences"]: r["n_terms"]
        for r in freq_spectrum(arr, "toks", tokens=True).collect()
    }
    assert got2 == dict(counts)
