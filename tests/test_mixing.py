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
    IDENTICAL for any bucket count, on the hash order, a numeric
    order_col, and (round 5) a STRING order_col whose bounds come from
    a seeded sample (bucketing is monotonic in the order key).
    bucketed_min_partitions=0 defeats the small-input adaptive gate so
    the bucketed plan itself is what's exercised."""
    budgets = {"web": 5_000, "code": 2_000}
    str_df = docs_df.withColumn(
        "skey", F.format_string("k%04d", (F.col("doc_id") * 37) % 601)
    )
    for kwargs in ({}, {"order_col": "doc_id"}, {"order_col": "skey"}):
        base = None
        for nb in (1, 7, 64, 1024):
            got = frozenset(
                r["doc_id"]
                for r in sample_by_token_budget(
                    str_df, budgets, order_buckets=nb,
                    bucketed_min_partitions=0, **kwargs
                ).collect()
            )
            if base is None:
                base = got
            assert got == base, (kwargs, nb)


def test_budget_sampling_adaptive_gate_identity(spark, docs_df):
    """Round 5: the adaptive gate (single-window plan below
    bucketed_min_partitions input partitions) must not change the
    selection — forced-bucketed and gated runs agree on every order
    mode."""
    budgets = {"web": 5_000, "code": 2_000}
    for kwargs in ({}, {"order_col": "doc_id"}):
        gated = frozenset(
            r["doc_id"]
            for r in sample_by_token_budget(
                docs_df, budgets, bucketed_min_partitions=10**6, **kwargs
            ).collect()
        )
        forced = frozenset(
            r["doc_id"]
            for r in sample_by_token_budget(
                docs_df, budgets, bucketed_min_partitions=0, **kwargs
            ).collect()
        )
        assert gated == forced, kwargs


def test_budget_sampling_string_order_bucketed_plan(spark, docs_df):
    """Round 5 ("What's missing" #2 closed): a string order key no
    longer falls back to the per-source single window — the forced
    bucketed plan's final window partitions by (source, __ob), so no
    window partition holds a whole source."""
    str_df = docs_df.withColumn(
        "skey", F.format_string("k%04d", (F.col("doc_id") * 37) % 601)
    )
    picked = sample_by_token_budget(
        str_df, {"web": 5_000, "code": 2_000}, order_col="skey",
        order_buckets=16, bucketed_min_partitions=0,
    )
    plan = picked._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "windowspecdefinition(source#" in plan or (
        "partitionspec" in plan.lower() and "__ob" in plan
    ), plan
    # the running-sum window is keyed by BOTH source and bucket
    import re

    assert re.search(r"windowspecdefinition\(source[^\)]*__ob", plan), plan


def test_budget_sampling_huge_doc_progress(spark):
    # first doc alone exceeds the budget: it must still be taken
    df = spark.createDataFrame(
        [(1, "s", 10_000), (2, "s", 5)], "doc_id long, source string, n_tok long"
    )
    got = sample_by_token_budget(df, {"s": 100}, order_col="doc_id").collect()
    assert [r["doc_id"] for r in got] == [1]
    assert sample_by_token_budget(df, {}, order_col="doc_id").count() == 0


def test_temperature_budgets_math(spark):
    from math import isqrt

    from sketchlib.spark.api import temperature_budgets

    rows = (
        [("en", 100) for _ in range(90)]
        + [("fr", 100) for _ in range(40)]
        + [("zh", 100) for _ in range(10)]
        + [(None, 100)]  # null source: no budget
    )
    df = spark.createDataFrame(rows, "src string, n long")
    # alpha=0.5: w = isqrt(tokens), integer split
    b = temperature_budgets(df, 7000, source_col="src", size_col="n", alpha=0.5)
    w = {"en": isqrt(9000), "fr": isqrt(4000), "zh": isqrt(1000)}
    sw = sum(w.values())
    assert b == {s: 7000 * ws // sw for s, ws in w.items()}
    # alpha=1 is proportional, alpha=0 is uniform
    b1 = temperature_budgets(df, 7000, source_col="src", size_col="n", alpha=1.0)
    assert b1 == {"en": 4500, "fr": 2000, "zh": 500}
    b0 = temperature_budgets(df, 7000, source_col="src", size_col="n", alpha=0.0)
    assert b0 == {"en": 7000 // 3, "fr": 7000 // 3, "zh": 7000 // 3}
    with pytest.raises(ValueError, match="alpha"):
        temperature_budgets(df, 10, source_col="src", size_col="n", alpha=-1)
    with pytest.raises(ValueError, match="total"):
        temperature_budgets(df, -1, source_col="src", size_col="n")


def test_sample_by_temperature_matches_manual_budgets(spark):
    from sketchlib.spark.api import (
        sample_by_temperature,
        sample_by_token_budget,
        temperature_budgets,
    )

    rng = np.random.default_rng(23)
    rows = [
        (i, ["en", "fr", "zh"][int(rng.integers(0, 3))], int(rng.integers(10, 200)))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string, n long")
    got = sample_by_temperature(
        df, 5000, source_col="src", size_col="n", alpha=0.5, order_col="doc_id"
    )
    budgets = temperature_budgets(df, 5000, source_col="src", size_col="n", alpha=0.5)
    want = sample_by_token_budget(
        df, budgets, source_col="src", size_col="n", order_col="doc_id"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # each per-source take honors the budget to within one document
    # (the crossing doc is included): b <= take < b + max_doc, unless
    # the source ran out first (take = its full supply)
    take = {
        r["src"]: r["t"]
        for r in got.groupBy("src").agg(F.sum("n").alias("t")).collect()
    }
    supply = {
        r["src"]: r["t"]
        for r in df.groupBy("src").agg(F.sum("n").alias("t")).collect()
    }
    max_doc = 199  # rng.integers(10, 200) upper bound
    for s, b in budgets.items():
        assert b > 0  # zero budgets must have been dropped
        if supply[s] < b:
            assert take[s] == supply[s]
        else:
            assert b <= take[s] < b + max_doc, (s, b, take[s])


def test_temperature_budgets_degenerate(spark):
    from sketchlib.spark.api import sample_by_temperature, temperature_budgets

    empty = spark.createDataFrame([], "src string, n long")
    assert temperature_budgets(empty, 100, source_col="src", size_col="n") == {}
    assert sample_by_temperature(empty, 100, source_col="src", size_col="n").count() == 0
    # a long-tail source whose integer share floors to 0 is dropped
    # from the dict entirely (no wasted shuffle on its rows)
    skew = spark.createDataFrame(
        [("big", 1_000_000), ("tiny", 1)], "src string, n long"
    )
    b = temperature_budgets(skew, 10, source_col="src", size_col="n", alpha=0.5)
    assert "tiny" not in b and b["big"] > 0
