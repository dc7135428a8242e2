"""Curation-scoring stress at 10x-class scale: unigram_logprob +
ngram_novelty over a replicated corpus with closed-form answers.

Corpus: sf0.1 documents (5,000) truncated to ``words`` words and
exploded ``replicas`` ways BYTE-IDENTICALLY (only doc_id differs),
plus ONE synthetic control doc made of globally-unique words.

Invariants (exact, no tolerance):
* novelty — every replicated doc's grams occur >= replicas times, so
  novelty must be EXACTLY 0.0 for all of them; the control doc must
  score EXACTLY 1.0.  Runs with hash_grams=True (the corpus-scale
  path: both shuffles carry 8-byte keys).
* logprob — identical text under the same self-model must produce the
  IDENTICAL score: for every base doc, count(distinct avg_logprob)
  over its replicas == 1; all rows present.

Usage:  python tools/stress_score.py [replicas] [words]
        (default 400 x 50 words = 2,000,000 docs, ~92M gram
        occurrences, ~100M term occurrences)

Run exclusively (no concurrent Spark on the box), like bench.py.
Results recorded in BASELINE.md "curation-scoring stress".
"""

from __future__ import annotations

import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main(replicas: int, words: int) -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "128")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from sketchlib.text.logprob import unigram_logprob
    from sketchlib.text.novelty import ngram_novelty

    base = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select(
            "doc_id",
            F.expr(f"array_join(slice(split(text, ' '), 1, {words}), ' ')")
            .alias("text"),
        )
    )
    control = spark.createDataFrame(
        [(9_999_999_999, " ".join(f"zqxv{i}unique" for i in range(words)))],
        ["doc_id", "text"],
    )
    docs = (
        base.select(
            "doc_id", "text",
            F.explode(F.expr(f"sequence(0, {replicas - 1})")).alias("__r"),
        )
        .select(
            (F.col("doc_id").cast("bigint")
             + F.col("__r").cast("bigint") * 10_000_000).alias("doc_id"),
            "text",
        )
        .union(control)
        .repartition(128, "doc_id")
        .persist()
    )
    n_in = docs.count()
    print(f"score_stress: rows_in={n_in} (replicas={replicas}, words={words})")

    # ---- novelty (hash_grams: 8-byte shuffle keys) ------------------
    t0 = time.monotonic()
    nov = ngram_novelty(docs, w=5, hash_grams=True)
    agg = nov.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            ((F.col("n_grams") > 0) & (F.col("novelty") != 0.0)
             & (F.col("doc_id") != 9_999_999_999)).cast("long")
        ).alias("nonzero_replicated"),
        F.max(
            F.when(F.col("doc_id") == 9_999_999_999, F.col("novelty"))
        ).alias("control_novelty"),
    ).first()
    t_nov = time.monotonic() - t0
    assert agg["n"] == n_in, (agg["n"], n_in)
    assert agg["nonzero_replicated"] == 0, agg["nonzero_replicated"]
    assert agg["control_novelty"] == 1.0, agg["control_novelty"]
    print(f"  novelty(hash_grams): {t_nov:.1f}s — all {n_in - 1} replicated "
          "docs exactly 0.0, control exactly 1.0")

    # ---- logprob (broadcast kernel, zero-shuffle scoring) -----------
    t0 = time.monotonic()
    lp = unigram_logprob(docs, "text")
    agg2 = (
        lp.select(F.pmod(F.col("doc_id"), F.lit(10_000_000)).alias("base"),
                  "avg_logprob")
        .groupBy("base")
        .agg(F.countDistinct("avg_logprob").alias("d"),
             F.count(F.lit(1)).alias("c"))
        .agg(F.max("d").alias("max_distinct"), F.sum("c").alias("rows"))
        .first()
    )
    t_lp = time.monotonic() - t0
    assert agg2["rows"] == n_in
    assert agg2["max_distinct"] == 1, agg2["max_distinct"]
    peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    print(f"  logprob(broadcast): {t_lp:.1f}s — identical text -> identical "
          f"score for every base doc; driver_peak_rss_mb={peak_mb:.0f}")
    spark.stop()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 400,
        int(sys.argv[2]) if len(sys.argv) > 2 else 50,
    )
