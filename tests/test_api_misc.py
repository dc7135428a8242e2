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
