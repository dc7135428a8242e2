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

    # realistic-vocab BPE: 32k merges over a synthetic vocab-rich
    # corpus (~100k distinct words > max_words, so the cap warning
    # fires and its effect is measured, and the merge loop has real
    # room — the word-soup documents corpus exhausts after ~93
    # merges).  The driver merge loop is the only non-distributed
    # stage: document its wall and peak RSS so the cap story is
    # quantified, not asserted.
    import resource
    import warnings

    rich = spark.range(200_000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.expr(
                "transform(sequence(1, 20), "
                "j -> concat('w', pmod(xxhash64(id, j), 100000)))"
            ),
        ).alias("text"),
    ).persist()
    n_rich = rich.count()
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    t0 = time.monotonic()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        merges32k = train_bpe(rich, num_merges=32_768, max_words=65_536)
    t_train32 = time.monotonic() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    truncated = any("max_words" in str(w.message) for w in caught)
    assert truncated, "expected the vocabulary cap warning to fire"
    t0 = time.monotonic()
    pieces32 = (
        bpe_encode(rich, merges32k)
        .agg(F.sum(F.size("bpe_tokens")).alias("p"))
        .first()["p"]
    )
    t_enc32 = time.monotonic() - t0
    print(
        f"bpe_32k: docs={n_rich} (4M words, ~100k vocab) "
        f"merges={len(merges32k)} train={t_train32:.2f}s "
        f"driver_rss_delta={(rss1 - rss0) / 1024:.0f}MB "
        f"vocab_truncated={truncated} "
        f"encode={t_enc32:.2f}s pieces={int(pieces32)} "
        f"({int(pieces32) / t_enc32 / 1e6:.1f}M pieces/s)"
    )
    rich.unpersist()

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
