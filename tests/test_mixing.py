"""Training-data mixing operators: per-group heavy hitters and
deterministic per-source token-budget sampling."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.spark.api import grouped_heavy_hitters, sample_by_token_budget


@pytest.fixture(scope="module")
def skewed_df(spark):
    # two groups with known Zipf-ish frequencies
    rows = []
    for g, base in (("a", 0), ("b", 100)):
        for v, c in ((1, 50), (2, 30), (3, 12), (4, 5), (5, 2), (6, 1)):
            rows.extend((g, base + v) for _ in range(c))
    return spark.createDataFrame(rows, "grp string, val long").repartition(8)


def test_grouped_heavy_hitters_exact_when_under_capacity(spark, skewed_df):
    got = grouped_heavy_hitters(skewed_df, ["grp"], "val", k=3, capacity=64)
    rows = got.collect()
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r["grp"], []).append((r["val"], r["est_count"]))
    # capacity >= distinct-per-group: counts are EXACT, order correct
    assert by_grp["a"] == [(1, 50), (2, 30), (3, 12)]
    assert by_grp["b"] == [(101, 50), (102, 30), (103, 12)]
    assert all(r["max_err"] == 0 for r in rows)


def test_grouped_heavy_hitters_guarantee_under_eviction(spark):
    # 1 heavy value + 200 singletons per group, capacity 32 << distinct:
    # the heavy value (count > N/capacity) must be tracked per group
    # and never undercounted
    rows = []
    for g in ("x", "y"):
        rows.extend((g, 7) for _ in range(300))
        rows.extend((g, 1000 + i) for i in range(200))
    df = spark.createDataFrame(rows, "grp string, val long").repartition(8)
    got = grouped_heavy_hitters(df, ["grp"], "val", k=1, capacity=32).collect()
    by_grp = {r["grp"]: r for r in got}
    for g in ("x", "y"):
        assert by_grp[g]["val"] == 7
        assert by_grp[g]["est_count"] >= 300  # never undercounts
        assert by_grp[g]["est_count"] - by_grp[g]["max_err"] <= 300


def test_grouped_heavy_hitters_empty(spark):
    df = spark.createDataFrame([], "grp string, val long")
    assert grouped_heavy_hitters(df, ["grp"], "val", k=3).count() == 0


@pytest.fixture(scope="module")
def docs_df(spark):
    rng = np.random.default_rng(4)
    rows = [
        (int(i), ["web", "code", "wiki"][i % 3], int(rng.integers(50, 500)))
        for i in range(600)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, n_tok long")


def test_budget_sampling_ordered_prefix_exact(spark, docs_df):
    budgets = {"web": 5_000, "code": 2_000}
    got = sample_by_token_budget(
        docs_df, budgets, order_col="doc_id"
    ).collect()
    # recompute the rule in plain python: per source in doc_id order,
    # take while the PRIOR cumulative sum < budget
    pdf = sorted(
        ((r["doc_id"], r["source"], r["n_tok"])
         for r in docs_df.collect()),
    )
    expect = set()
    prior = {s: 0 for s in budgets}
    for did, src, nt in pdf:
        if src in budgets and prior[src] < budgets[src]:
            expect.add(did)
            prior[src] += nt
    assert {r["doc_id"] for r in got} == expect
    # wiki had no budget -> excluded entirely
    assert all(r["source"] != "wiki" for r in got)
    # each budgeted source reaches (or crosses by <= one doc) its budget
    sums = {
        r["source"]: r["s"]
        for r in spark.createDataFrame(got)
        .groupBy("source").agg(F.sum("n_tok").alias("s")).collect()
    }
    for s, b in budgets.items():
        assert sums[s] >= b  # crossed
        # removing the last-selected doc drops below budget
        last = max(d for d in expect
                   if dict((x[0], x[1]) for x in pdf)[d] == s)
        last_tok = dict((x[0], x[2]) for x in pdf)[last]
        assert sums[s] - last_tok < b


def test_budget_sampling_hash_order_deterministic(spark, docs_df):
    a = {r["doc_id"] for r in sample_by_token_budget(
        docs_df, {"web": 3_000}, seed=9).collect()}
    b = {r["doc_id"] for r in sample_by_token_budget(
        docs_df, {"web": 3_000}, seed=9).collect()}
    c = {r["doc_id"] for r in sample_by_token_budget(
        docs_df, {"web": 3_000}, seed=10).collect()}
    assert a == b  # same seed -> identical draw
    assert a != c  # different seed -> different draw
    # unbiased-ish: the hash draw is not the doc_id prefix
    prefix = {r["doc_id"] for r in sample_by_token_budget(
        docs_df, {"web": 3_000}, order_col="doc_id").collect()}
    assert a != prefix


def test_budget_sampling_bucketed_prefix_sum_invariant(spark, docs_df):
    """Round 4: the running sum is a two-phase distributed prefix sum
    (order-domain buckets + per-bucket offsets) so no source's whole
    row set lands in one window task.  Exactness: the selection must be
    IDENTICAL for any bucket count, on both the hash order and a
    numeric order_col (bucketing is monotonic in the order key)."""
    budgets = {"web": 5_000, "code": 2_000}
    for kwargs in ({}, {"order_col": "doc_id"}):
        base = None
        for nb in (1, 7, 64, 1024):
            got = frozenset(
                r["doc_id"]
                for r in sample_by_token_budget(
                    docs_df, budgets, order_buckets=nb, **kwargs
                ).collect()
            )
            if base is None:
                base = got
            assert got == base, (kwargs, nb)


def test_budget_sampling_huge_doc_progress(spark):
    # first doc alone exceeds the budget: it must still be taken
    df = spark.createDataFrame(
        [(1, "s", 10_000), (2, "s", 5)], "doc_id long, source string, n_tok long"
    )
    got = sample_by_token_budget(df, {"s": 100}, order_col="doc_id").collect()
    assert [r["doc_id"] for r in got] == [1]
    assert sample_by_token_budget(df, {}, order_col="doc_id").count() == 0
