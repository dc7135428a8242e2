"""Hypothesis property tests for the event-stream operators: random
small corpora (dense key/instant domains force ties, empty keys, and
no-match cases) checked against driver-side python oracles.  Few
examples per property — each example is a Spark round-trip."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sketchlib.spark.asof import asof_join
from sketchlib.spark.sessions import sessionize, with_rolling_stats

SPARKY = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

# dense domains: key in 0..2, ts in 0..15 -> ties and cross-key
# collisions are the COMMON case, not the rare one
left_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.one_of(st.none(), st.integers(0, 15))),
    min_size=0,
    max_size=12,
)
# right side unique per (key, ts) by construction (dict-dedup below)
right_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 15), st.integers(-5, 5)),
    min_size=0,
    max_size=10,
)


def _py_asof(levs, revs, direction, tolerance):
    out = {}
    for lid, k, ts in levs:
        best = None
        if ts is not None:
            for rk, rts, rv in revs:
                ok = rts <= ts if direction == "backward" else rts >= ts
                if rk != k or not ok:
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


@SPARKY
@given(
    left=left_strategy,
    right=right_strategy,
    direction=st.sampled_from(["backward", "forward"]),
    tolerance=st.one_of(st.none(), st.integers(0, 6)),
)
def test_asof_property(spark, left, right, direction, tolerance):
    levs = [(i, k, ts) for i, (k, ts) in enumerate(left)]
    revs = [(k, ts, float(v)) for (k, ts), v in
            {(k, ts): v for k, ts, v in right}.items()]
    ldf = spark.createDataFrame(levs or [(0, 0, None)], "id long, k long, ts long")
    rdf = spark.createDataFrame(revs or [(99, 99, 0.0)], "k long, ts long, v double")
    got = {
        r["id"]: (r["v"], r["mts"])
        for r in asof_join(
            ldf, rdf, on="ts", by="k", direction=direction,
            tolerance=tolerance, matched_on_col="mts",
        ).collect()
    }
    want = _py_asof(levs or [(0, 0, None)], revs or [(99, 99, 0.0)],
                    direction, tolerance)
    assert got == want


@SPARKY
@given(
    events=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 40)),
        min_size=1, max_size=15,
    ),
    gap=st.integers(1, 12),
)
def test_sessionize_property(spark, events, gap):
    rows = [(i, k, ts) for i, (k, ts) in enumerate(events)]
    df = spark.createDataFrame(rows, "eid long, k long, ts long")
    got = {
        (r["k"], r["session_idx"]): (r["ts_start"], r["ts_end"], r["n_events"])
        for r in sessionize(
            df, ts_col="ts", key_col="k", gap=gap, output="sessions"
        ).collect()
    }
    # oracle: per key, sorted ts, boundary where diff > gap
    want = {}
    bykey = {}
    for _, k, ts in rows:
        bykey.setdefault(k, []).append(ts)
    for k, tss in bykey.items():
        tss.sort()
        sid, cur = 0, []
        for i, ts in enumerate(tss):
            if i == 0 or ts - tss[i - 1] > gap:
                if cur:
                    want[(k, sid)] = (cur[0], cur[-1], len(cur))
                sid += 1
                cur = []
            cur.append(ts)
        want[(k, sid)] = (cur[0], cur[-1], len(cur))
    assert got == want


@SPARKY
@given(
    events=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 40)),
        min_size=1, max_size=15,
    ),
    window=st.integers(0, 15),
)
def test_rolling_property(spark, events, window):
    rows = [(i, k, ts) for i, (k, ts) in enumerate(events)]
    df = spark.createDataFrame(rows, "eid long, k long, ts long")
    got = {
        r["eid"]: r["rolling_count"]
        for r in with_rolling_stats(
            df, ts_col="ts", key_col="k", window=window
        ).collect()
    }
    for eid, k, ts in rows:
        want = sum(
            1 for _, k2, t2 in rows if k2 == k and ts - window <= t2 <= ts
        )
        assert got[eid] == want, (eid, k, ts)
