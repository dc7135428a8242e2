"""rollup_time_windows / interval_join (sketchlib/spark/sessions.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sketchlib.spark.sessions import interval_join, rollup_time_windows


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def events_df(spark):
    rows = [
        (1, _ts(0), "a", 1.0),
        (2, _ts(14, 59), "a", 2.0),
        (3, _ts(15), "a", 4.0),
        (4, _ts(16), "b", 8.0),
        (5, _ts(44, 59), "b", 16.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )


def test_rollup_tumbling(spark, events_df):
    out = rollup_time_windows(
        events_df,
        "ts",
        "15 minutes",
        {"n": F.count(F.lit(1)), "total": F.sum("value")},
    ).collect()
    got = {
        (r["window_start"], r["n"], r["total"]) for r in out
    }
    m15 = 15 * 60 * 1_000_000
    base = int(dt.datetime(2024, 1, 1).timestamp()) * 1_000_000
    # conftest session tz is UTC so timestamp() aligns; windows: [0,
    # 15), [15, 30), [30, 45)
    assert got == {
        (base, 2, 3.0),
        (base + m15, 2, 12.0),
        (base + 2 * m15, 1, 16.0),
    }
    for r in out:
        assert r["window_end"] - r["window_start"] == m15


def test_rollup_grouped_and_hopping(spark, events_df):
    grouped = rollup_time_windows(
        events_df, "ts", "15 minutes", {"n": F.count(F.lit(1))},
        by=["event_type"],
    ).collect()
    m15 = 15 * 60 * 1_000_000
    base = min(r["window_start"] for r in grouped)
    per_type = {
        (r["event_type"], (r["window_start"] - base) // m15): r["n"]
        for r in grouped
    }
    # exact per-key window assignment: a: 2 in w0, 1 in w1; b: 1 in
    # w1, 1 in w2 (see the fixture's minute offsets)
    assert per_type == {("a", 0): 2, ("a", 1): 1, ("b", 1): 1, ("b", 2): 1}
    hopping = rollup_time_windows(
        events_df, "ts", "30 minutes", {"n": F.count(F.lit(1))},
        slide="15 minutes",
    )
    # every event falls in exactly TWO hopping windows
    assert sum(r["n"] for r in hopping.collect()) == 10
    with pytest.raises(ValueError, match="non-empty"):
        rollup_time_windows(events_df, "ts", "15 minutes", {})
    with pytest.raises(ValueError, match="collide"):
        rollup_time_windows(
            events_df, "ts", "15 minutes", {"window_start": F.count("*")}
        )
    with pytest.raises(TypeError, match="timestamp"):
        rollup_time_windows(
            events_df, "event_id", "15 minutes", {"n": F.count("*")}
        )


@pytest.fixture(scope="module")
def intervals_df(spark):
    rows = [
        (100, _ts(0), _ts(15)),      # [00:00, 00:15)
        (200, _ts(10), _ts(45)),     # [00:10, 00:45)
        (300, _ts(50), _ts(50)),     # degenerate: matches nothing
    ]
    return spark.createDataFrame(
        rows, "interval_id long, lo timestamp, hi timestamp"
    )


def _expected_pairs(events, intervals):
    out = set()
    for e in events:
        for iv in intervals:
            if iv[1] <= e[1] < iv[2]:
                out.add((e[0], iv[0]))
    return out


def test_interval_join_exact_pairs(spark, events_df, intervals_df):
    want = _expected_pairs(
        [(r["event_id"], r["ts"]) for r in events_df.collect()],
        [(r["interval_id"], r["lo"], r["hi"]) for r in intervals_df.collect()],
    )
    for bucket in ("1 minute", "7 minutes", "1 hour", "30 days"):
        got = {
            (r["event_id"], r["interval_id"])
            for r in interval_join(
                events_df, intervals_df, "ts", "lo", "hi", bucket=bucket
            ).collect()
        }
        assert got == want, bucket
    # half-open: ts == hi excluded, ts == lo included (in `want` by
    # construction — event 3 at 00:15 is NOT in [00:00, 00:15))
    assert (3, 100) not in want and (1, 100) in want


def test_interval_join_by_keys(spark, events_df, intervals_df):
    ivs = intervals_df.withColumn(
        "event_type", F.when(F.col("interval_id") == 100, "a").otherwise("b")
    )
    got = {
        (r["event_id"], r["interval_id"])
        for r in interval_join(
            events_df, ivs, "ts", "lo", "hi", by=["event_type"],
            bucket="5 minutes",
        ).collect()
    }
    # key match required on top of containment
    assert got == {(1, 100), (2, 100), (4, 200), (5, 200)}


def test_interval_join_validation(spark, events_df, intervals_df):
    with pytest.raises(ValueError, match="overlapping"):
        interval_join(
            events_df,
            intervals_df.withColumnRenamed("interval_id", "event_id"),
            "ts", "lo", "hi",
        )
    with pytest.raises(ValueError, match="months/years"):
        interval_join(
            events_df, intervals_df, "ts", "lo", "hi", bucket="1 month"
        )


def test_interval_join_date_columns(spark):
    """Native DATE columns (real TPC-H) are widened to timestamp_ntz
    and just work; a non-temporal column fails naming the parameter."""
    pts = spark.createDataFrame(
        [(1, dt.date(2024, 1, 5)), (2, dt.date(2024, 2, 1))],
        "pid long, d date",
    )
    ivs = spark.createDataFrame(
        [(10, dt.date(2024, 1, 1), dt.date(2024, 1, 8))],
        "iid long, lo date, hi date",
    )
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(pts, ivs, "d", "lo", "hi", bucket="3 days").collect()
    }
    assert got == {(1, 10)}
    with pytest.raises(TypeError, match="ts_col='pid'"):
        interval_join(pts, ivs, "pid", "lo", "hi")


def test_rollup_start_time_offset(spark, events_df):
    """start_time shifts the tumbling origin (the DuckDB multi-day
    alignment knob)."""
    out = rollup_time_windows(
        events_df, "ts", "15 minutes", {"n": F.count(F.lit(1))},
        start_time="5 minutes",
    ).collect()
    m15 = 15 * 60 * 1_000_000
    m5 = 5 * 60 * 1_000_000
    assert all((r["window_start"] - m5) % m15 == 0 for r in out)
    assert sum(r["n"] for r in out) == 5


def test_interval_join_skew_subsplit_exact(spark, events_df, intervals_df):
    """The sub-split plan (max_bucket_pairs) must return EXACTLY the
    default plan's pairs — one hot bucket forced by a threshold of 1,
    across bucket widths and with by-keys."""
    want = _expected_pairs(
        [(r["event_id"], r["ts"]) for r in events_df.collect()],
        [(r["interval_id"], r["lo"], r["hi"]) for r in intervals_df.collect()],
    )
    for bucket in ("1 minute", "1 hour", "30 days"):
        got = {
            (r["event_id"], r["interval_id"])
            for r in interval_join(
                events_df, intervals_df, "ts", "lo", "hi",
                bucket=bucket, max_bucket_pairs=1,
            ).collect()
        }
        assert got == want, bucket
    # with by-keys: hot detection per (key, bucket)
    ivs = intervals_df.withColumn(
        "event_type", F.when(F.col("interval_id") == 100, "a").otherwise("b")
    )
    base = {
        (r["event_id"], r["interval_id"])
        for r in interval_join(
            events_df, ivs, "ts", "lo", "hi", by=["event_type"],
            bucket="1 hour",
        ).collect()
    }
    split = {
        (r["event_id"], r["interval_id"])
        for r in interval_join(
            events_df, ivs, "ts", "lo", "hi", by=["event_type"],
            bucket="1 hour", max_bucket_pairs=1,
        ).collect()
    }
    assert split == base


def test_interval_join_skew_plan_shape(spark, events_df, intervals_df):
    """With a hot bucket the plan must be a UNION of the cold coarse
    join and the fine-grid hot join — and still no
    BroadcastNestedLoopJoin anywhere; with a high threshold (no hot
    bucket) the single coarse join is kept verbatim."""
    hot = interval_join(
        events_df, intervals_df, "ts", "lo", "hi",
        bucket="1 hour", max_bucket_pairs=1,
    )
    plan = hot._jdf.queryExecution().analyzed().toString()
    assert "__f" in plan and "Union" in plan
    phys = hot._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in phys
    cold = interval_join(
        events_df, intervals_df, "ts", "lo", "hi",
        bucket="1 hour", max_bucket_pairs=10_000_000,
    )
    cplan = cold._jdf.queryExecution().analyzed().toString()
    assert "__f" not in cplan and "Union" not in cplan


def test_interval_join_skew_validation(spark, events_df, intervals_df):
    with pytest.raises(ValueError, match="max_bucket_pairs"):
        interval_join(
            events_df, intervals_df, "ts", "lo", "hi", max_bucket_pairs=0
        )
    with pytest.raises(ValueError, match="max_bucket_pairs"):
        interval_join(
            events_df, intervals_df, "ts", "lo", "hi",
            max_bucket_pairs="always",
        )


def test_interval_join_auto_default(spark, events_df, intervals_df):
    """The default is now max_bucket_pairs='auto': the count probe
    runs (one tiny job), but at this scale no bucket crosses the
    crossover threshold, so the plan stays the single coarse join and
    the pairs match an explicit None run exactly."""
    auto = interval_join(events_df, intervals_df, "ts", "lo", "hi",
                         bucket="1 hour")
    plan = auto._jdf.queryExecution().analyzed().toString()
    assert "__f" not in plan and "Union" not in plan
    base = {
        (r["event_id"], r["interval_id"])
        for r in interval_join(
            events_df, intervals_df, "ts", "lo", "hi",
            bucket="1 hour", max_bucket_pairs=None,
        ).collect()
    }
    got = {(r["event_id"], r["interval_id"]) for r in auto.collect()}
    assert got == base
