"""Reproduce the round-5 text-preprocessing stress numbers
(BASELINE.md "text stress evidence" section).

Usage:  python tools/stress_text.py [sf_dir]

Three experiments over a 10x-replicated documents corpus (sf0.1 x 10
= 50,000 docs, ~2.7M words per copy), each printing one line:
1. bpe train+encode+roundtrip: the encode kernel's throughput with
   the per-task word cache, and the exact-decode invariant asserted
   on EVERY row.
2. normalize_text full recipe (lower+NFC+collapse+trim) wall time.
3. split_passages explode wall time + row count sanity.

Run exclusively (no concurrent Spark on the box), like bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(sf_dir: str) -> None:
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    tenx = base
    for i in range(1, 10):
        tenx = tenx.unionByName(
            base.withColumn(
                "doc_id", F.col("doc_id") + F.lit(i * 10_000_000)
            )
        )
    tenx = tenx.repartition(64, "doc_id").persist()
    n = tenx.count()

    from sketchlib.text.bpe import bpe_decode_column, bpe_encode, train_bpe

    t0 = time.monotonic()
    merges = train_bpe(tenx, num_merges=256)
    t_train = time.monotonic() - t0
    t0 = time.monotonic()
    agg = (
        bpe_encode(tenx, merges)
        .withColumn("back", bpe_decode_column(F.col("bpe_tokens")))
        .agg(
            F.sum(
                (
                    F.col("back")
                    == F.trim(F.regexp_replace("text", r"\s+", " "))
                ).cast("long")
            ).alias("rt"),
            F.sum(F.size("bpe_tokens")).alias("pieces"),
        )
        .first()
    )
    t_enc = time.monotonic() - t0
    assert int(agg["rt"]) == n, (agg["rt"], n)
    print(
        f"bpe_10x: docs={n} merges={len(merges)} train={t_train:.2f}s "
        f"encode+verify={t_enc:.2f}s pieces={int(agg['pieces'])} "
        f"({int(agg['pieces']) / t_enc / 1e6:.1f}M pieces/s) roundtrip=ALL"
    )

    from sketchlib.text.normalize import normalize_text, split_passages

    t0 = time.monotonic()
    norm_rows = normalize_text(tenx).agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.length("text")).alias("chars")
    ).first()
    t_norm = time.monotonic() - t0
    assert int(norm_rows["n"]) == n
    print(
        f"normalize_10x: docs={n} chars={int(norm_rows['chars'])} "
        f"wall={t_norm:.2f}s "
        f"({int(norm_rows['chars']) / t_norm / 1e6:.1f}M chars/s)"
    )

    t0 = time.monotonic()
    n_pass = split_passages(tenx, sep=" table ").count()
    t_split = time.monotonic() - t0
    assert n_pass >= n  # every doc yields at least one passage
    print(f"split_10x: docs={n} passages={n_pass} wall={t_split:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
