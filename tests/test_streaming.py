"""Structured Streaming sketch maintenance: file-source micro-batches,
foreachBatch global sketch (exactly-once ledger) and
applyInPandasWithState per-key sketches."""

import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.core.tdigest import TDigest
from sketchlib.streaming.stream import (
    current_sketch,
    run_streaming_sketch,
    streaming_grouped_sketch,
)


def _write_batches(spark, src_dir: str, n_files: int, rows_per_file: int, seed=0):
    rng = np.random.default_rng(seed)
    all_vals = []
    for i in range(n_files):
        vals = rng.uniform(0, 1000, rows_per_file)
        all_vals.append(vals)
        keys = rng.choice(["a", "b"], rows_per_file)
        df = spark.createDataFrame(
            list(zip(keys.tolist(), [float(v) for v in vals])),
            "k string, v double",
        )
        df.coalesce(1).write.mode("overwrite").parquet(f"{src_dir}/f{i}")
    return np.concatenate(all_vals)


def _wait_done(query, timeout=60):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        query.processAllAvailable()
        if not query.status["isDataAvailable"]:
            return
        time.sleep(0.2)


def test_foreachbatch_global_sketch(spark, tmp_path):
    src = str(tmp_path / "src")
    vals = _write_batches(spark, src, n_files=3, rows_per_file=2000)
    stream = (
        spark.readStream.schema("k string, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    ledger = str(tmp_path / "ledger")
    ckpt = str(tmp_path / "ckpt")
    q = run_streaming_sketch(
        stream, "v", lambda: TDigest(delta=300), ledger, ckpt
    )
    try:
        _wait_done(q)
    finally:
        q.stop()
    sk = current_sketch(spark, ledger)
    assert sk is not None
    assert sk.count == vals.size
    true = np.quantile(vals, [0.1, 0.5, 0.9])
    est = sk.value_at_quantile(np.array([0.1, 0.5, 0.9]))
    assert np.all(np.abs(est - true) / true <= 0.02)


def test_grouped_streaming_state(spark, tmp_path):
    src = str(tmp_path / "gsrc")
    _write_batches(spark, src, n_files=2, rows_per_file=3000, seed=7)
    stream = (
        spark.readStream.schema("k string, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    out = streaming_grouped_sketch(
        stream, "k", "v", lambda: TDigest(delta=300), quantiles=(0.5,)
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("grouped_sketch_test")
        .option("checkpointLocation", str(tmp_path / "gckpt"))
        .start()
    )
    try:
        _wait_done(q)
    finally:
        q.stop()
    pdf = spark.sql(
        "SELECT * FROM grouped_sketch_test"
    ).toPandas()
    # last update per key covers all rows of that key
    latest = pdf.groupby("k")["items"].max()
    total = int(latest.sum())
    assert total == 6000
    # median of U[0,1000) per key ~ 500
    last_rows = pdf.sort_values("items").groupby("k").tail(1)
    for _, r in last_rows.iterrows():
        assert abs(r["q0"] - 500.0) <= 25.0


def test_windowed_quantiles_with_watermark(spark, tmp_path):
    from datetime import datetime, timezone

    from sketchlib.streaming.stream import streaming_windowed_quantiles

    src = str(tmp_path / "wsrc")
    base = datetime(2026, 1, 1, 0, 0, 0, tzinfo=timezone.utc).timestamp()

    def write_file(i, rows):
        df = spark.createDataFrame(rows, "ts timestamp, v double")
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/f{i}")

    def ts(sec):
        from datetime import datetime, timezone

        return datetime.fromtimestamp(base + sec, tz=timezone.utc)

    # window A: [0, 10), window B: [20, 30), window C: [40, 50)
    rng = np.random.default_rng(2)
    a_vals = rng.uniform(0, 100, 500)
    b_vals = rng.uniform(100, 200, 500)
    write_file(0, [(ts(float(i % 9)), float(v)) for i, v in enumerate(a_vals)])
    write_file(1, [(ts(20 + float(i % 9)), float(v)) for i, v in enumerate(b_vals)])
    # file 2 advances the watermark far past B and carries a LATE row
    # for window A, which must not resurrect it
    write_file(2, [(ts(45.0), 999.0), (ts(1.0), 12345.0)])

    stream = (
        spark.readStream.schema("ts timestamp, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    out = streaming_windowed_quantiles(
        stream, "ts", "v", lambda: TDigest(delta=300),
        window_duration="10 seconds", watermark_delay="5 seconds",
        quantiles=(0.5,),
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("windowed_sketch_test")
        .option("checkpointLocation", str(tmp_path / "wckpt"))
        .start()
    )
    try:
        _wait_done(q)
    finally:
        q.stop()
    pdf = spark.sql("SELECT * FROM windowed_sketch_test").toPandas()
    finals = {r["window_start"].second + r["window_start"].minute * 60: r
              for _, r in pdf.iterrows()}
    # windows A and B finalized exactly once each
    assert 0 in finals and 20 in finals, pdf
    a, b = finals[0], finals[20]
    assert a["items"] == 500  # the late row was dropped, not absorbed
    assert abs(a["q0"] - np.quantile(a_vals, 0.5)) <= 5.0
    assert b["items"] == 500
    assert abs(b["q0"] - np.quantile(b_vals, 0.5)) <= 5.0


def test_windowed_quantiles_per_key(spark, tmp_path):
    from datetime import datetime, timezone

    from sketchlib.streaming.stream import streaming_windowed_quantiles

    src = str(tmp_path / "ksrc")
    base = datetime(2026, 1, 1, tzinfo=timezone.utc).timestamp()

    def ts(sec):
        return datetime.fromtimestamp(base + sec, tz=timezone.utc)

    rng = np.random.default_rng(5)
    rows0 = [(ts(float(i % 9)), "a" if i % 2 else "b",
              float(v if i % 2 else v + 1000))
             for i, v in enumerate(rng.uniform(0, 100, 400))]
    df = spark.createDataFrame(rows0, "ts timestamp, k string, v double")
    df.coalesce(1).write.mode("overwrite").parquet(f"{src}/f0")
    # second file advances the watermark past the first window
    spark.createDataFrame(
        [(ts(40.0), "a", 1.0)], "ts timestamp, k string, v double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/f1")

    stream = (
        spark.readStream.schema("ts timestamp, k string, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    out = streaming_windowed_quantiles(
        stream, "ts", "v", lambda: TDigest(delta=200),
        window_duration="10 seconds", watermark_delay="5 seconds",
        quantiles=(0.5,), key_col="k",
    )
    q = (
        out.writeStream.outputMode("append").format("memory")
        .queryName("windowed_key_test")
        .option("checkpointLocation", str(tmp_path / "kckpt"))
        .start()
    )
    try:
        _wait_done(q)
    finally:
        q.stop()
    pdf = spark.sql("SELECT * FROM windowed_key_test").toPandas()
    first = pdf[pdf["window_start"].dt.second == 0]
    by_k = {r["k"]: r for _, r in first.iterrows()}
    assert set(by_k) == {"a", "b"}
    assert by_k["a"]["items"] + by_k["b"]["items"] == 400
    assert by_k["a"]["q0"] < 200  # key a ~ U[0,100)
    assert by_k["b"]["q0"] > 900  # key b ~ U[1000,1100)


def test_streaming_dedup_exact(spark, tmp_path):
    """Keep-first streaming dedup: duplicates across micro-batches are
    suppressed; watermarked state (dropDuplicatesWithinWatermark)
    catches late duplicates with differing event times."""
    import datetime as dt

    from sketchlib.streaming.stream import streaming_dedup_exact

    src = str(tmp_path / "dsrc")
    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    # batch files processed in order: doc 1 repeats in every file with
    # drifting timestamps; doc i is unique per file
    for i in range(3):
        rows = [(1, base + dt.timedelta(seconds=i)), (10 + i, base)]
        spark.createDataFrame(rows, "doc_id long, ts timestamp") \
            .coalesce(1).write.mode("overwrite").parquet(f"{src}/f{i}")
    stream = (
        spark.readStream.schema("doc_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    out = streaming_dedup_exact(
        stream, ["doc_id"], event_time_col="ts", delay="1 hour"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dckpt"))
        .start()
    )
    try:
        _wait_done(q)
    finally:
        q.stop()
    got = spark.sql("SELECT doc_id FROM dedup_sink").collect()
    ids = sorted(r["doc_id"] for r in got)
    assert ids == [1, 10, 11, 12]  # doc 1 emitted exactly once


def test_streaming_cardinality_hll_and_theta(spark, tmp_path):
    """The foreachBatch ledger machinery is sketch-generic: the same
    stream maintains an HLL (cardinality, within the published RSE
    bound) and a theta sketch (EXACT below k) with no code specific
    to either — factory + kind are the only knobs."""
    from sketchlib.core.hll import HyperLogLog
    from sketchlib.core.theta import ThetaSketch
    from sketchlib.spark.aggregate import KIND_HASH64

    src = str(tmp_path / "src")
    # 3 files with overlapping id ranges: distinct = [0, 12000)
    spans = [(0, 6000), (4000, 9000), (7000, 12000)]
    for i, (lo, hi) in enumerate(spans):
        spark.range(lo, hi).select(
            F.format_string("id-%06d", F.col("id")).alias("k")
        ).coalesce(1).write.mode("overwrite").parquet(f"{src}/f{i}")
    stream = (
        spark.readStream.schema("k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    for name, factory, check in (
        (
            "hll",
            lambda: HyperLogLog(p=12),
            # p=12 -> RSE 1.04/sqrt(4096) ~= 1.6%; 4x margin
            lambda est: abs(est - 12_000) / 12_000 <= 0.065,
        ),
        (
            "theta",
            lambda: ThetaSketch(k=16384),
            # 12k distinct < k: exact mode, digit-exact
            lambda est: est == 12_000,
        ),
    ):
        ledger = str(tmp_path / f"ledger_{name}")
        ckpt = str(tmp_path / f"ckpt_{name}")
        q = run_streaming_sketch(
            stream, "k", factory, ledger, ckpt, kind=KIND_HASH64,
            query_name=f"card_{name}",
        )
        try:
            _wait_done(q)
        finally:
            q.stop()
        sk = current_sketch(spark, ledger)
        assert sk is not None
        assert check(float(sk.estimate())), (name, sk.estimate())
