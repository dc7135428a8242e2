"""Scale-shape evidence for the ranking operators: the plans that
matter at 100 TB, asserted on the physical plan and bounded on the
wall clock at millions of rows.

The single-window global rank funnels EVERYTHING through one
SinglePartition exchange; the bucketed plan must not.  The
single-window per-group top-k ships a whole hot group to one task;
the two-level plan bounds every window partition."""

import time

import pytest
from pyspark.sql import functions as F

from sketchlib.spark.api import top_k_per_group, with_global_rank


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_global_rank_bucketed_plan_has_no_single_partition(spark):
    df = (
        spark.range(0, 4_000_000)
        .withColumnRenamed("id", "doc_id")
        .withColumn("score", (F.col("doc_id") * 2654435761 % 1000003))
    )
    t0 = time.monotonic()
    ranked = with_global_rank(
        df,
        "score",
        tie_cols=["doc_id"],
        bucketed_min_partitions=0,
        order_buckets=256,
    )
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.countDistinct("rank").alias("k"),
        F.min("rank").alias("lo"),
        F.max("rank").alias("hi"),
    ).first()
    elapsed = time.monotonic() - t0
    # every row ranked, ranks are a permutation of 1..N
    assert tuple(agg) == (4_000_000, 4_000_000, 1, 4_000_000)
    plan = _plan(ranked)
    assert "SinglePartition" not in plan, plan
    # generous bound: catches an all-rows-in-one-task sort, not noise
    assert elapsed < 120, f"bucketed rank took {elapsed:.0f}s"


def test_global_rank_small_plan_is_single_window(spark):
    """Below the partition gate the plan IS the single window —
    documenting the contrast the adaptive gate switches on."""
    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    ranked = with_global_rank(df, "doc_id", bucketed_min_partitions=10**9)
    assert "SinglePartition" in _plan(ranked)


def test_top_k_hot_group_two_level(spark):
    """One group holding 2M of 2.05M rows: the two-level plan must
    return the exact top-5 and put two Window nodes in the plan."""
    n = 2_000_000
    hot = spark.range(0, n).select(
        F.lit("hot").alias("g"), F.col("id").alias("doc_id")
    )
    cold = spark.range(n, n + 50_000).select(
        (F.concat(F.lit("c"), F.col("id") % 1000)).alias("g"),
        F.col("id").alias("doc_id"),
    )
    df = hot.unionByName(cold)
    t0 = time.monotonic()
    out = top_k_per_group(
        df,
        ["g"],
        5,
        order_col="doc_id",
        descending=True,
        two_level_min_partitions=0,
    )
    got = sorted(
        (r["doc_id"], r["rank"])
        for r in out.filter(F.col("g") == "hot").collect()
    )
    elapsed = time.monotonic() - t0
    want = sorted((n - 1 - i, i + 1) for i in range(5))
    assert got == want
    plan = _plan(out)
    # "Window [" matches WindowExec only, not WindowGroupLimit (the
    # 3.5+ rank-limit pushdown that partial-top-ks before shuffles)
    assert plan.count("Window [") >= 2, plan
    assert elapsed < 120, f"hot-group top-k took {elapsed:.0f}s"


def test_top_k_small_plan_is_single_window(spark):
    df = spark.range(0, 100).select(
        (F.col("id") % 5).alias("g"), F.col("id").alias("doc_id")
    )
    out = top_k_per_group(
        df, ["g"], 3, order_col="doc_id", two_level_min_partitions=10**9
    )
    plan = _plan(out)
    assert plan.count("Window [") == 1
    # Spark's own rank-limit pushdown partial-top-ks before the
    # shuffle even in the single-window plan
    assert "WindowGroupLimit" in plan


def test_order_buckets_bounds_validated(spark):
    """order_buckets rides into a driver-built literal offsets array
    and a 32-bit bucket cast — out-of-range values must fail loudly
    upfront (advisor r6), in both with_global_rank and shuffle_rows."""
    import pytest

    from sketchlib.spark.api import shuffle_rows, with_global_rank

    df = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    for bad in (0, -5, (1 << 20) + 1, 1 << 31):
        with pytest.raises(ValueError, match="order_buckets"):
            with_global_rank(df, "doc_id", order_buckets=bad).collect()
        with pytest.raises(ValueError, match="order_buckets"):
            shuffle_rows(df, order_buckets=bad).collect()
