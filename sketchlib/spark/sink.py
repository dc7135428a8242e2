"""Deterministic sharded output writer.

A tokenized-corpus release is consumed by data loaders that want a
FIXED number of shards with a stable doc->shard mapping (resumable
downloads, per-shard loader workers, reproducible epoch order seeds).
``write_sharded`` provides that: hash-assigned shards (content-keyed,
so re-running the job on the same input reproduces byte-identical
shard membership regardless of input partitioning), one directory per
shard, and a manifest built from parquet FOOTER metadata — no second
data scan.

100-TB shape: ONE shuffle keyed by shard id (repartition(n_shards) on
the shard column co-locates each shard into exactly one task ->
exactly one file per shard directory, no small-file spray), then a
footer-only read for the manifest (Spark's count on parquet is
metadata-optimized; rows are never re-decoded)."""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SHARD_COL = "__shard"


def shard_key(cols: list[str], n_shards: int, seed: int = 42) -> Column:
    """Default shard assignment: ``pmod(xxhash64(cols, seed), n)`` —
    uniform, content-keyed, independent of row order and partitioning."""
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in cols], F.lit(seed)), F.lit(n_shards)
    )


def write_sharded(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_cols: list[str] | None = None,
    shard_expr: Column | None = None,
    seed: int = 42,
    mode: str = "error",
) -> dict:
    """Write ``df`` as ``path/__shard=<i>/`` parquet directories with a
    deterministic content-keyed shard assignment, and return a manifest
    ``{"n_shards": n, "total_rows": N, "shards": {i: rows}}`` (also
    persisted as ``path/_sharding_manifest.json``).

    ``shard_expr`` overrides the hash with a caller-supplied integer
    Column in [0, n_shards) — e.g. an arithmetic key any engine
    computes identically, for cross-engine verification; the
    production default is the seeded xxhash64 of ``key_cols`` (all
    columns when None)."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if mode == "append":
        # the manifest is rebuilt from a post-write footer scan, so an
        # append would fold pre-existing rows into "this run's" counts
        # — misleading metadata.  Re-shard into a fresh directory
        # instead (shard assignment is content-keyed and reproducible).
        raise ValueError(
            "write_sharded does not support mode='append': the manifest "
            "counts the whole directory, not this run; write to a new "
            "path (shard membership is deterministic) or use overwrite"
        )
    if shard_expr is None:
        keys = key_cols if key_cols is not None else list(df.columns)
        shard_expr = shard_key(keys, n_shards, seed)
    out = df.withColumn(SHARD_COL, shard_expr.cast("int"))
    # repartition BY the shard column: each shard lands in one task ->
    # one file per directory (hive-partitioned by shard)
    (
        out.repartition(n_shards, F.col(SHARD_COL))
        .write.mode(mode)
        .partitionBy(SHARD_COL)
        .parquet(path)
    )
    # manifest from footer metadata only: count(*) over parquet prunes
    # every column and reads row-group counts, not data
    spark = df.sparkSession
    counts = (
        spark.read.parquet(path)
        .groupBy(SHARD_COL)
        .count()
        .collect()
    )
    shards = {int(r[SHARD_COL]): int(r["count"]) for r in counts}
    # a shard that received zero rows writes no directory — record it
    # as 0 so readers always see exactly n_shards manifest entries
    for i in range(n_shards):
        shards.setdefault(i, 0)
    manifest = {
        "n_shards": int(n_shards),
        "total_rows": int(sum(shards.values())),
        "shards": {str(k): shards[k] for k in sorted(shards)},
    }
    with open(os.path.join(path, "_sharding_manifest.json"), "w") as f:
        json.dump(manifest, f, sort_keys=True)
    return manifest


def read_sharded(
    spark, path: str, shards: list[int] | None = None
) -> DataFrame:
    """Read a sharded dataset back; ``shards`` prunes to specific shard
    directories via partition pruning (the filter never touches other
    shards' files)."""
    df = spark.read.parquet(path)
    if shards is not None:
        df = df.filter(F.col(SHARD_COL).isin([int(s) for s in shards]))
    return df
