"""Sessionization and as-of join: python-recompute oracles on seeded
event streams, tie/null/tolerance edges, plan shape."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.spark.asof import asof_join
from sketchlib.spark.sessions import sessionize


def _mk_events(n=400, keys=7, seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                int(rng.integers(0, keys)),
                int(rng.integers(0, 100_000)),
                float(rng.normal(50, 10)),
            )
        )
    # forced ties: same (key, ts) for three rows
    rows += [(n, 0, 500, 1.0), (n + 1, 0, 500, 2.0), (n + 2, 0, 500, 3.0)]
    return rows


def _py_sessions(rows, gap):
    """(key, session_idx) -> [event ids]; boundaries on sorted ts."""
    bykey = {}
    for eid, k, ts, v in rows:
        bykey.setdefault(k, []).append((ts, eid, v))
    out = {}
    for k, evs in bykey.items():
        evs.sort()
        sid, prev = 0, None
        for ts, eid, v in evs:
            if prev is None or ts - prev > gap:
                sid += 1
            prev = ts
            out.setdefault((k, sid), []).append((eid, ts, v))
    return out


@pytest.fixture(scope="module")
def events_df(spark):
    return spark.createDataFrame(
        _mk_events(), "event_id long, k long, ts long, value double"
    )


def test_sessionize_matches_python(spark, events_df):
    gap = 5000
    want = _py_sessions(_mk_events(), gap)
    got = sessionize(
        events_df, ts_col="ts", key_col="k", gap=gap, output="sessions",
        aggs={"sum_value": F.sum("value")},
    ).collect()
    assert len(got) == len(want)
    for r in got:
        evs = want[(r["k"], r["session_idx"])]
        assert r["n_events"] == len(evs)
        assert r["ts_start"] == min(t for _, t, _ in evs)
        assert r["ts_end"] == max(t for _, t, _ in evs)
        assert r["sum_value"] == pytest.approx(sum(v for *_, v in evs))


def test_sessionize_events_output_ties_deterministic(spark, events_df):
    got = sessionize(events_df, ts_col="ts", key_col="k", gap=5000)
    rows = {r["event_id"]: r["session_idx"] for r in got.collect()}
    want = _py_sessions(_mk_events(), 5000)
    for (k, sid), evs in want.items():
        for eid, _, _ in evs:
            assert rows[eid] == sid
    # the three tied rows share one session
    n = max(rows) - 2
    assert rows[n] == rows[n + 1] == rows[n + 2]


def test_sessionize_timestamp_gap_in_seconds(spark):
    t0 = dt.datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [
            (1, t0),
            (2, t0 + dt.timedelta(seconds=10)),
            (3, t0 + dt.timedelta(seconds=100)),
            (4, None),
        ],
        "event_id long, ts timestamp",
    ).withColumn("k", F.lit(1))
    out = sessionize(df, gap=30.0, key_col="k", output="events").collect()
    idx = {r["event_id"]: r["session_idx"] for r in out}
    assert idx == {1: 1, 2: 1, 3: 2}  # null-ts row dropped


def test_sessionize_validation(spark, events_df):
    with pytest.raises(ValueError, match="output"):
        sessionize(events_df, ts_col="ts", key_col="k", output="nope")
    with pytest.raises(ValueError, match="session_idx"):
        sessionize(
            events_df.withColumn("session_idx", F.lit(1)),
            ts_col="ts", key_col="k",
        )


def _py_asof(levs, revs, direction="backward", tolerance=None):
    """left (id, k, ts) x right (k, ts, v) -> id -> (v, matched_ts)."""
    out = {}
    for lid, k, ts in levs:
        best = None
        if ts is not None:
            for rk, rts, rv in revs:
                if rk != k or rts is None:
                    continue
                ok = rts <= ts if direction == "backward" else rts >= ts
                if not ok:
                    continue
                if tolerance is not None and abs(ts - rts) > tolerance:
                    continue
                if (
                    best is None
                    or (direction == "backward" and rts > best[1])
                    or (direction == "forward" and rts < best[1])
                ):
                    best = (rv, rts)
        out[lid] = best or (None, None)
    return out


@pytest.fixture(scope="module")
def asof_sides(spark):
    rng = np.random.default_rng(17)
    levs = [
        (i, int(rng.integers(0, 5)), int(rng.integers(0, 10_000)))
        for i in range(200)
    ]
    levs.append((200, 0, None))  # null left instant
    revs = [
        (k, int(t), float(k * 1000 + t))
        for k in range(4)  # key 4 never matches
        for t in rng.choice(10_000, size=40, replace=False)
    ]
    revs.append((0, None, -1.0))  # null right instant: dropped
    ldf = spark.createDataFrame(levs, "id long, k long, ts long")
    rdf = spark.createDataFrame(revs, "k long, ts long, v double")
    return levs, revs, ldf, rdf


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_python(spark, asof_sides, direction):
    levs, revs, ldf, rdf = asof_sides
    out = asof_join(
        ldf, rdf, on="ts", by="k", direction=direction,
        matched_on_col="mts",
    ).collect()
    want = _py_asof(levs, revs, direction)
    assert len(out) == len(levs)
    for r in out:
        assert (r["v"], r["mts"]) == want[r["id"]], r["id"]


def test_asof_tolerance(spark, asof_sides):
    levs, revs, ldf, rdf = asof_sides
    out = asof_join(
        ldf, rdf, on="ts", by="k", tolerance=500, matched_on_col="mts"
    ).collect()
    want = _py_asof(levs, revs, "backward", tolerance=500)
    for r in out:
        assert (r["v"], r["mts"]) == want[r["id"]], r["id"]


def test_asof_equal_ts_inclusive(spark):
    ldf = spark.createDataFrame([(1, 1, 100)], "id long, k long, ts long")
    rdf = spark.createDataFrame([(1, 100, 7.0)], "k long, ts long, v double")
    for d in ("backward", "forward"):
        assert asof_join(ldf, rdf, on="ts", by="k", direction=d).collect()[0]["v"] == 7.0


def test_asof_validation(spark, asof_sides):
    _, _, ldf, rdf = asof_sides
    with pytest.raises(ValueError, match="direction"):
        asof_join(ldf, rdf, on="ts", by="k", direction="nearest")
    with pytest.raises(ValueError, match="missing"):
        asof_join(ldf, rdf, on="nope", by="k")
    with pytest.raises(ValueError, match="collides"):
        asof_join(ldf, rdf.withColumnRenamed("v", "id"), on="ts", by="k")
    with pytest.raises(ValueError, match="payload"):
        asof_join(ldf, rdf.select("k", "ts"), on="ts", by="k")


def test_asof_null_payload_not_smeared(spark):
    # the matched row's NULL payload must stay NULL (not inherit an
    # older right row's value): payload + matched instant are atomic
    ldf = spark.createDataFrame([(1, 1, 250)], "id long, k long, ts long")
    rdf = spark.createDataFrame(
        [(1, 100, 5.0), (1, 200, None)], "k long, ts long, v double"
    )
    r = asof_join(ldf, rdf, on="ts", by="k", matched_on_col="mts").collect()[0]
    assert r["mts"] == 200 and r["v"] is None


def test_asof_null_by_keys_never_match(spark):
    # SQL equality semantics: NULL by keys match nothing on either side
    ldf = spark.createDataFrame(
        [(1, None, 100), (2, 1, 100)], "id long, k long, ts long"
    )
    rdf = spark.createDataFrame(
        [(None, 50, 1.0), (1, 50, 2.0)], "k long, ts long, v double"
    )
    got = {r["id"]: r["v"] for r in asof_join(ldf, rdf, on="ts", by="k").collect()}
    assert got == {1: None, 2: 2.0}


def test_scratch_column_collisions_raise(spark, events_df, asof_sides):
    _, _, ldf, rdf = asof_sides
    with pytest.raises(ValueError, match="__t"):
        sessionize(events_df.withColumn("__t", F.lit(1)), ts_col="ts", key_col="k")
    with pytest.raises(ValueError, match="internals"):
        asof_join(ldf.withColumn("__side", F.lit(1)), rdf, on="ts", by="k")
    with pytest.raises(ValueError, match="__m"):
        asof_join(ldf, rdf.withColumnRenamed("v", "__m"), on="ts", by="k")


def test_epoch_micros_ntz_exact(spark):
    # NTZ micros must be wall-clock (timezone-independent) int64 —
    # the DuckDB epoch_us parity contract for naive timestamps
    from sketchlib.spark.sessions import epoch_micros

    df = spark.sql(
        "SELECT TIMESTAMP_NTZ '2024-01-01 00:09:58.778549' AS ts"
    )
    got = df.select(
        epoch_micros("ts", df.schema["ts"].dataType).alias("u")
    ).collect()[0]["u"]
    assert got == 1704067798778549
    with pytest.raises(TypeError, match="timestamp"):
        epoch_micros("x", df.selectExpr("1 AS x").schema["x"].dataType)


def test_sessionize_ntz_timestamps(spark):
    # parquet-style TIMESTAMP_NTZ through the full sessionize path
    df = spark.sql(
        "SELECT * FROM VALUES "
        "(1, 1, TIMESTAMP_NTZ '2024-01-01 00:00:00'), "
        "(2, 1, TIMESTAMP_NTZ '2024-01-01 00:00:20'), "
        "(3, 1, TIMESTAMP_NTZ '2024-01-01 01:00:00') "
        "AS t(event_id, k, ts)"
    )
    idx = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(df, key_col="k", gap=30.0).collect()
    }
    assert idx == {1: 1, 2: 1, 3: 2}


def test_rolling_stats_matches_python(spark, events_df):
    from sketchlib.spark.sessions import with_rolling_stats

    win = 3000
    got = {
        r["event_id"]: (r["rolling_count"], r["rolling_value"])
        for r in with_rolling_stats(
            events_df, ts_col="ts", key_col="k", window=win,
            aggs={"rolling_value": F.sum("value")},
        ).collect()
    }
    rows = _mk_events()
    assert len(got) == len(rows)
    bykey = {}
    for eid, k, ts, v in rows:
        bykey.setdefault(k, []).append((ts, v))
    for eid, k, ts, v in rows:
        inwin = [(t, x) for t, x in bykey[k] if ts - win <= t <= ts]
        assert got[eid][0] == len(inwin), eid
        assert got[eid][1] == pytest.approx(sum(x for _, x in inwin))
    # the three tied rows share one RANGE frame: identical results
    n = max(got) - 2
    assert got[n] == got[n + 1] == got[n + 2]


def test_rolling_stats_timestamp_and_validation(spark, events_df):
    import datetime as dtm

    from sketchlib.spark.sessions import with_rolling_stats

    t0 = dtm.datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [(1, 1, t0), (2, 1, t0 + dtm.timedelta(seconds=50)),
         (3, 1, t0 + dtm.timedelta(seconds=200)), (4, 1, None)],
        "event_id long, k long, ts timestamp",
    )
    got = {
        r["event_id"]: r["rolling_count"]
        for r in with_rolling_stats(df, key_col="k", window=60.0).collect()
    }
    assert got == {1: 1, 2: 2, 3: 1}  # null-ts dropped; 60s window
    with pytest.raises(ValueError, match="rolling_count"):
        with_rolling_stats(
            with_rolling_stats(df, key_col="k"), key_col="k"
        )


def test_rolling_stats_numeric_window_coercion(spark, events_df):
    # the DEFAULT window=3600.0 on a numeric ts_col must coerce to an
    # int RANGE bound (rangeBetween has no float overload), and a
    # fractional window on a numeric column fails loud
    from sketchlib.spark.sessions import with_rolling_stats

    out = with_rolling_stats(events_df, ts_col="ts", key_col="k")
    assert out.count() == events_df.count()
    with pytest.raises(ValueError, match="integer window"):
        with_rolling_stats(events_df, ts_col="ts", key_col="k", window=0.5)


def test_rolling_and_session_aggs_collisions(spark, events_df):
    from sketchlib.spark.sessions import sessionize, with_rolling_stats

    # an aggs name matching an input column would silently overwrite
    # it AND feed later aggs the windowed values — must raise
    with pytest.raises(ValueError, match="collide"):
        with_rolling_stats(
            events_df, ts_col="ts", key_col="k",
            aggs={"value": F.avg("value")},
        )
    with pytest.raises(ValueError, match="collide"):
        sessionize(
            events_df, ts_col="ts", key_col="k", output="sessions",
            aggs={"n_events": F.sum("value")},
        )


def test_no_python_nodes(spark, asof_sides, events_df):
    _, _, ldf, rdf = asof_sides
    for df in (
        asof_join(ldf, rdf, on="ts", by="k"),
        sessionize(events_df, ts_col="ts", key_col="k", output="sessions"),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan
