"""interval_join hot-bucket (skew) stress — the df^2 analogue of the
ngram hot-gram case: ALL intervals and ALL points land in one 7-day
bucket, so the coarse equi-join crosses every pair (pts x ivs
candidates) even though true matches are sparse (short intervals).

Usage:  python tools/stress_interval.py [n_points] [n_intervals]

Three experiments, one line each:
1. coarse plan (default) on the hot-bucket input — candidate blowup.
2. sub-split plan (max_bucket_pairs=1e6) on the same input — the
   fine-grid mitigation; pair sets must be identical.
3. uniform control (intervals spread over a year, no hot bucket):
   probe cost when the sub-split never triggers.

Run exclusively (no concurrent Spark on the box), like bench.py.
Results recorded in BASELINE.md "interval skew stress".
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

WEEK_S = 7 * 24 * 3600
IVLEN_S = 1800  # 30-minute intervals


def main(n_points: int, n_intervals: int) -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from sketchlib.spark.sessions import interval_join

    rng = np.random.default_rng(42)
    p_off = rng.integers(0, WEEK_S, n_points)
    i_off = rng.integers(0, WEEK_S - IVLEN_S, n_intervals)

    def frames(iv_spread_weeks: int):
        """points in week 0; intervals in weeks [0, spread)."""
        shift = rng.integers(0, iv_spread_weeks, n_intervals) * WEEK_S
        pts = spark.createDataFrame(
            [(int(i), int(v)) for i, v in enumerate(p_off)],
            "pid long, sec long",
        ).select("pid", F.timestamp_seconds("sec").alias("ts"))
        ivs = spark.createDataFrame(
            [
                (int(i), int(lo), int(lo + IVLEN_S))
                for i, lo in enumerate(i_off + shift)
            ],
            "iid long, lo_s long, hi_s long",
        ).select(
            "iid",
            F.timestamp_seconds("lo_s").alias("lo"),
            F.timestamp_seconds("hi_s").alias("hi"),
        )
        return pts.persist(), ivs.persist()

    pts, ivs = frames(iv_spread_weeks=1)  # everything in ONE bucket
    pts.count(), ivs.count()

    def pair_sig(out):
        """(count, order-independent pair-set checksum) in ONE action:
        count equality alone would pass a drop-one-duplicate-another
        bug; the xxhash64 sum over (pid, iid) pins the multiset."""
        # decimal(38,0) sum: a long sum of int64 hashes overflows
        # under ANSI mode; decimal comfortably holds 1e9 * 2^63
        r = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("pid", "iid").cast("decimal(38,0)")),
                F.lit(0),
            ).alias("sig"),
        ).first()
        return int(r["n"]), int(r["sig"])

    t = time.time()
    n_coarse, sig_coarse = pair_sig(interval_join(pts, ivs, "ts", "lo", "hi"))
    t_coarse = time.time() - t
    print(
        f"hot-bucket coarse: {n_points}x{n_intervals} "
        f"(~{n_points * n_intervals / 1e6:.0f}M candidates) "
        f"-> {n_coarse} pairs in {t_coarse:.2f}s"
    )

    t = time.time()
    n_split, sig_split = pair_sig(
        interval_join(pts, ivs, "ts", "lo", "hi", max_bucket_pairs=1_000_000)
    )
    t_split = time.time() - t
    assert (n_split, sig_split) == (n_coarse, sig_coarse), (
        (n_split, sig_split), (n_coarse, sig_coarse)
    )
    print(
        f"hot-bucket sub-split (max_bucket_pairs=1e6): {n_split} pairs "
        f"in {t_split:.2f}s ({t_coarse / max(t_split, 1e-9):.1f}x) "
        f"[identical pair multiset: count + xxhash64 checksum]"
    )

    pts.unpersist(), ivs.unpersist()
    pts_u, ivs_u = frames(iv_spread_weeks=52)  # uniform control
    pts_u.count(), ivs_u.count()
    t = time.time()
    n_plain, sig_plain = pair_sig(
        interval_join(pts_u, ivs_u, "ts", "lo", "hi")
    )
    t_plain = time.time() - t
    t = time.time()
    n_probe, sig_probe = pair_sig(
        interval_join(pts_u, ivs_u, "ts", "lo", "hi", max_bucket_pairs=1_000_000)
    )
    t_probe = time.time() - t
    assert (n_probe, sig_probe) == (n_plain, sig_plain)
    print(
        f"uniform control: {n_plain} pairs, plain {t_plain:.2f}s vs "
        f"probe-enabled {t_probe:.2f}s (probe overhead "
        f"{t_probe - t_plain:+.2f}s, no sub-split triggered)"
    )
    spark.stop()


if __name__ == "__main__":
    n_p = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_i = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    main(n_p, n_i)
