"""overlap_matrix scale stress — sketch one-scan plan vs the exact
distinct self-join, on a corpus where the exact plan's shuffle is the
job.

Synthetic shape mirrors the north-star input: G sources, each holding
``n_rows`` sequences over a per-source key range with 50% pairwise
range overlap between neighbouring sources, so every pair has a known
exact answer to bound the sketch against AND the exact join has real
work to do.

Usage:  python tools/stress_overlap.py [n_rows_per_group] [n_groups]
        python tools/stress_overlap.py wide [n_groups]

``wide`` stresses the DISTRIBUTED blocked all-pairs path at large G
(default 5,000 groups -> 12.5M pair rows): exact staircase key ranges
(every neighbour pair jaccard exactly 1/3, every distant pair
disjoint), all verification done with Spark-side aggregates — the
pair table is never collected — and the driver python process's peak
RSS is asserted flat (far below what materializing the pairs would
cost).

Run exclusively (no concurrent Spark on the box), like bench.py.
Results recorded in BASELINE.md "overlap_matrix stress".
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(n_rows: int, n_groups: int) -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from sketchlib.spark.api import overlap_matrix

    # group g owns keys [g*H, g*H + 2H) with H = n_keys/2 — 50%
    # overlap with each neighbour, none beyond.  Keys are drawn
    # deterministically (pmod of a hash) so each group's distinct-key
    # count is ~min(2H, n_rows) with duplicates, like real doc ids.
    half = n_rows // 2
    parts = []
    for g in range(n_groups):
        parts.append(
            spark.range(n_rows).select(
                F.lit(f"src{g}").alias("source"),
                (
                    F.lit(g * half)
                    + F.pmod(F.xxhash64("id", F.lit(g)), F.lit(2 * half))
                ).alias("key"),
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.union(p)
    df = df.repartition(64).persist()
    total = df.count()

    t0 = time.time()
    est = overlap_matrix(df, "source", "key", k=4096).collect()
    t_sketch = time.time() - t0

    t0 = time.time()
    # persist the distinct frame: BOTH exact actions (counts + self
    # join) read it — without this the distinct shuffle re-executes
    # and the exact baseline is unfairly slow (review catch)
    w = df.distinct().persist()
    d = {
        r["source"]: r["nd"]
        for r in w.groupBy("source").agg(F.count(F.lit(1)).alias("nd")).collect()
    }
    exact = {
        (r["ga"], r["gb"]): r["n"]
        for r in (
            w.select(F.col("source").alias("ga"), "key")
            .join(w.select(F.col("source").alias("gb"), "key"), "key")
            .filter(F.col("ga") < F.col("gb"))
            .groupBy("ga", "gb")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    t_exact = time.time() - t0
    w.unpersist()

    worst_d = worst_i = 0.0
    for r in est:
        ga, gb = r["group_a"], r["group_b"]
        worst_d = max(
            worst_d,
            abs(r["distinct_a"] - d[ga]) / d[ga],
            abs(r["distinct_b"] - d[gb]) / d[gb],
        )
        ex = exact.get((ga, gb), 0)
        if ex:
            worst_i = max(worst_i, abs(r["intersection"] - ex) / ex)
        else:
            assert r["intersection"] <= 0.01 * max(d[ga], d[gb]), (
                ga, gb, r["intersection"]
            )
    # k=4096 -> RSE ~1.56%; 5x bound mirrors the gate
    assert worst_d <= 5 * 0.0157, worst_d
    assert worst_i <= 6 * 0.0157, worst_i
    n_pairs = n_groups * (n_groups - 1) // 2
    print(
        f"overlap_stress: rows={total} groups={n_groups} pairs={n_pairs} "
        f"sketch={t_sketch:.2f}s exact_join={t_exact:.2f}s "
        f"({t_exact / max(t_sketch, 1e-9):.1f}x) "
        f"worst_distinct_err={worst_d:.4f} worst_intersection_err={worst_i:.4f}"
    )
    spark.stop()


def main_wide(n_groups: int, k: int = 256) -> None:
    import resource

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from sketchlib.spark.api import overlap_matrix, release_overlap_cache

    # group g holds keys EXACTLY [g*1000, g*1000 + 2000): neighbour
    # pairs intersect in exactly 1000 keys (jaccard 1/3), any pair two
    # or more apart is disjoint — every one of the G*(G-1)/2 pairs has
    # a closed-form answer without an exact join.
    per, half = 2000, 1000
    df = (
        spark.range(n_groups * per)
        .select(
            (F.col("id") / per).cast("long").alias("source"),
            (
                (F.col("id") / per).cast("long") * half + F.pmod(F.col("id"), F.lit(per))
            ).alias("key"),
        )
        .repartition(64)
    )
    t0 = time.time()
    pairs = overlap_matrix(df, "source", "key", k=k)
    rep = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.max(
            F.when(
                F.col("group_b") - F.col("group_a") == 1,
                F.abs(F.col("jaccard") - 1.0 / 3.0),
            )
        ).alias("worst_nbr_jaccard_err"),
        F.max(
            F.when(
                F.col("group_b") - F.col("group_a") >= 2, F.col("intersection")
            )
        ).alias("worst_disjoint_mass"),
        F.max(
            F.greatest(
                F.abs(F.col("distinct_a") - per), F.abs(F.col("distinct_b") - per)
            )
            / per
        ).alias("worst_distinct_err"),
    ).collect()[0]
    t = time.time() - t0
    release_overlap_cache()
    want_pairs = n_groups * (n_groups - 1) // 2
    assert rep["n_pairs"] == want_pairs, rep
    rse = 1.0 / (k - 2) ** 0.5  # k=256 -> ~6.3%
    assert rep["worst_distinct_err"] <= 5 * rse, rep
    # max over ~G neighbour pairs at k=256 (rse ~6.3%): allow ~3x
    # the single-pair jaccard-algebra error
    assert rep["worst_nbr_jaccard_err"] <= 0.2, rep
    assert rep["worst_disjoint_mass"] <= 0.02 * per, rep
    peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    # flat-RSS claim: the 12.5M-pair table is never collected — the
    # driver python process must stay far under what materializing it
    # as rows would cost (multiple GB)
    assert peak_mb < 2048, peak_mb
    print(
        f"overlap_wide_stress: groups={n_groups} pairs={rep['n_pairs']} "
        f"k={k} wall={t:.1f}s driver_peak_rss_mb={peak_mb:.0f} "
        f"worst_distinct_err={rep['worst_distinct_err']:.4f} "
        f"worst_nbr_jaccard_err={rep['worst_nbr_jaccard_err']:.4f} "
        f"worst_disjoint_mass={rep['worst_disjoint_mass']:.1f}"
    )
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "wide":
        main_wide(int(sys.argv[2]) if len(sys.argv) > 2 else 5_000)
    else:
        main(
            int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000,
            int(sys.argv[2]) if len(sys.argv) > 2 else 8,
        )
