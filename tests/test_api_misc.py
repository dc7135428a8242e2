"""Miscellaneous spark/api operators: table profiling."""

from pyspark.sql import functions as F  # noqa: F401


def test_profile_table(spark):
    """Two-scan profiler: exact rows/nulls per column, HLL distinct
    within tolerance, null phantom corrected."""
    from sketchlib.spark.api import profile_table

    df = spark.createDataFrame(
        [(i, f"g{i % 7}", None if i % 10 == 0 else float(i % 50))
         for i in range(2000)],
        "id long, grp string, val double",
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert set(prof) == {"id", "grp", "val"}
    for c in prof:
        assert prof[c]["n_rows"] == 2000
    assert prof["id"]["n_nulls"] == 0
    assert prof["val"]["n_nulls"] == 200
    assert prof["id"]["dtype"] == "bigint"
    # distinct: exact 2000 / 7 / 45 within HLL tolerance (p=12 ~1.6%);
    # val's exact count is 45 — every i with i%50 in {0,10,20,30,40}
    # also has i%10==0 and is null
    assert abs(prof["id"]["approx_distinct"] - 2000) <= 2000 * 0.05
    assert prof["grp"]["approx_distinct"] == 7
    assert abs(prof["val"]["approx_distinct"] - 45) <= 3
    # column subset
    sub = profile_table(df, ["grp"]).collect()
    assert len(sub) == 1 and sub[0]["column"] == "grp"


def test_with_quantile_rank_accuracy_and_buckets(spark):
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from sketchlib.spark.api import with_quantile_rank

    rng = np.random.default_rng(31)
    vals = rng.uniform(0.0, 1000.0, 5000)
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id long, v double"
    ).repartition(8)
    out = with_quantile_rank(df, "v", buckets=10)
    # exact rank for comparison (gate-scale window is fine in a test)
    exact = df.withColumn(
        "exact", F.percent_rank().over(Window.orderBy("v"))
    )
    joined = out.join(exact.select("id", "exact"), "id")
    worst = joined.agg(
        F.max(F.abs(F.col("q_rank") - F.col("exact")))
    ).collect()[0][0]
    assert worst <= 0.01, worst  # t-digest rank-error bar
    rows = joined.collect()
    for r in rows:
        assert 0.0 <= r["q_rank"] <= 1.0
        assert r["q_bucket"] == min(int(r["q_rank"] * 10), 9)
    assert {r["q_bucket"] for r in rows} == set(range(10))


def test_with_quantile_rank_nulls_empty_validation(spark):
    from pyspark.sql import functions as F

    from sketchlib.spark.api import with_quantile_rank

    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 10.0)], "id long, v double"
    )
    got = {r["id"]: (r["q_rank"], r["q_bucket"])
           for r in with_quantile_rank(df, "v", buckets=4).collect()}
    assert got[2] == (None, None)
    assert got[1][0] is not None and got[3][0] is not None
    empty = spark.createDataFrame([], "id long, v double")
    e = with_quantile_rank(empty, "v", buckets=4)
    assert e.count() == 0 and "q_rank" in e.columns and "q_bucket" in e.columns
    import pytest as _pt

    with _pt.raises(ValueError, match="already present"):
        with_quantile_rank(df.withColumn("q_rank", F.lit(1.0)), "v")
    with _pt.raises(ValueError, match="buckets"):
        with_quantile_rank(df, "v", buckets=0)


def test_plan_partitions_does_not_zero_observations(spark):
    """Regression: Dataset.rdd posts a listener event with EMPTY
    observed metrics; an un-fired upstream Observation latched it and
    silently read 0.  _plan_partitions must use the event-free
    accessor, so adaptive-gate operators (rank/topk/sampler/ann) keep
    caller observations intact."""
    from pyspark.sql import Observation

    from sketchlib.spark.api import _plan_partitions, shuffle_rows

    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    obs = Observation()
    o = df.observe(obs, F.count(F.lit(1)).alias("rows"))
    n = _plan_partitions(o, assume=1)
    assert n >= 1
    out = shuffle_rows(o, seed=1, key_cols=["doc_id"])
    assert out.count() == 100
    assert int(obs.get["rows"]) == 100
