"""Reproduce the round-5 continuation dedup stress numbers
(BASELINE.md "dedup stress evidence" section).

Usage:  python tools/stress_dedup.py [sf_dir]

Three experiments, each printing one line:
1. dedup_spans over 10x documents (every doc duplicated 10 ways —
   the maximal-coverage worst case; every row must scrub to '').
2. ngram_jaccard_pairs over the same corpus, index vs prefix
   (uniform df=10: the inverted index's best case).
3. the hot-gram crossover: 20k synthetic docs sharing one 7-word
   boilerplate sentence (hot df=20k) — the index plan's join rows
   grow as df^2, prefix stays linear.

Run exclusively (no concurrent Spark on the box), like bench.py.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(sf_dir: str) -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from sketchlib.dedup.ngram import ngram_jaccard_pairs
    from sketchlib.dedup.spans import remove_duplicate_spans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    big = docs
    for c in range(1, 10):
        big = big.union(
            docs.select(
                (F.col("doc_id") + c * 10_000_000).alias("doc_id"), "text"
            )
        )
    big = big.persist()
    n = big.count()
    print(f"docs {n}")

    # docs shorter than w words have no grams and pass through
    # verbatim (the operator's documented contract) — only the rest
    # must scrub to '' under 10x exact copies
    scrubbable = big.filter(
        F.size(F.split(F.coalesce("text", F.lit("")), " ")) >= 5
    ).count()
    t = time.time()
    r = (
        remove_duplicate_spans(big, w=5)
        .agg(
            F.count("*"),
            F.sum("n_removed"),
            F.sum(F.when(F.col("text") == "", 1).otherwise(0)),
        )
        .collect()[0]
    )
    print(
        f"spans_10x {time.time() - t:.2f}s rows {r[0]} "
        f"removed {r[1]} scrubbed {r[2]} scrubbable {scrubbable}"
    )
    assert r[0] == n and r[2] == scrubbable, (
        "10x copies must scrub every >=w-word doc"
    )

    for m in ("index", "prefix"):
        t = time.time()
        p = ngram_jaccard_pairs(big, w=3, threshold=0.5, method=m).count()
        print(f"ngram_{m}_10x {time.time() - t:.2f}s pairs {p}")

    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(20000)]
    boiler = "terms of service apply to all visitors"
    rows = [
        (i, " ".join(list(rng.choice(words, size=30))) + " " + boiler)
        for i in range(20_000)
    ]
    hot = spark.createDataFrame(rows, "doc_id long, text string")
    for m in ("prefix", "index"):
        t = time.time()
        p = ngram_jaccard_pairs(
            hot, w=3, threshold=0.5, method=m, hash_grams=True
        ).count()
        print(f"ngram_{m}_hotgram20k {time.time() - t:.2f}s pairs {p}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
