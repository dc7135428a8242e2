"""Exact deduplication via two-stage hash-groupBy.

Scale shape: stage 1 aggregates on ``xxhash64(col)`` only (8-byte
shuffle keys, map-side combine — full text never shuffles for unique
documents); only hash buckets with count > 1 are joined back to verify
byte equality (collision safety) and collect the member ids.  At
100 TB the duplicate side is a small fraction, so the verify join's
build side stays tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_duplicate_groups(
    df: DataFrame, col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """DataFrame[rep_id, n_dups, ids] — one row per duplicate group
    (n_dups >= 2), ids sorted, rep_id = the minimum id."""
    hashed = df.select(
        F.col(id_col).alias("__id"), F.col(col).alias("__v"),
        F.xxhash64(F.col(col)).alias("__h"),
    )
    cand = hashed.groupBy("__h").agg(F.count("*").alias("__n")).filter("__n > 1")
    return (
        hashed.join(cand.select("__h"), "__h")
        .groupBy("__h", "__v")  # byte-equality verify within hash bucket
        .agg(
            F.count("*").alias("n_dups"),
            F.sort_array(F.collect_list("__id")).alias("ids"),
        )
        .filter("n_dups > 1")
        .select(
            F.element_at("ids", 1).alias("rep_id"),
            F.col("n_dups"),
            F.col("ids"),
        )
    )
