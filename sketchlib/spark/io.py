"""Input/output: Iceberg-first table reader with parquet fallback.

The production target is an Iceberg table of ~10^12 pre-tokenized
sequences (north rule).  With the DataSource V2 ``iceberg`` format on
the classpath the reader uses it directly; WITHOUT the jar (this
sandbox) an Iceberg table DIRECTORY is still read correctly by
resolving its manifest chain with ``sketchlib.iceberg`` and scanning
exactly the current snapshot's live data files — never a raw directory
listing, which would double-count compacted files and resurrect
deleted ones.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _is_iceberg_dir(source: str) -> bool:
    meta = os.path.join(source, "metadata")
    if not os.path.isdir(meta):
        return False
    return any(f.endswith(".metadata.json") for f in os.listdir(meta))


def _read_iceberg_dir(
    spark: SparkSession, source: str, snapshot_id: int | None = None
) -> DataFrame:
    """Manifest-resolved read of an Iceberg table directory: the scan
    covers exactly the snapshot's live files (jar-free path)."""
    from sketchlib.iceberg import snapshot_file_paths

    paths = snapshot_file_paths(source, snapshot_id=snapshot_id)
    if not paths:
        raise FileNotFoundError(f"iceberg table {source} has no live data files")
    return spark.read.parquet(*paths)


def read_table(
    spark: SparkSession,
    source: str,
    fmt: str = "auto",
    snapshot_id: int | None = None,
    schema=None,
) -> DataFrame:
    """Read ``source`` as a DataFrame.

    fmt="iceberg": catalog table name (``cat.db.tbl``), or an Iceberg
    table DIRECTORY (resolved via its manifest chain when the iceberg
    format jar is absent).
    fmt="parquet": file/directory path.
    fmt="auto": Iceberg table dirs and catalog-table names route to
    iceberg; everything else is parquet.
    """
    if fmt == "iceberg":
        # snapshot_id must be honored on EVERY path — time travel that
        # silently reads the current snapshot is wrong data, not a
        # degraded mode.  The DSv2 reader takes .option("snapshot-id").
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        if os.path.isdir(source) and _is_iceberg_dir(source):
            try:
                return reader.load(source)
            except Exception:
                return _read_iceberg_dir(spark, source, snapshot_id)
        return reader.load(source)
    if fmt == "parquet":
        if snapshot_id is not None:
            raise ValueError("snapshot_id requires an Iceberg source")
        return spark.read.parquet(source)
    if fmt in ("jsonl", "json"):
        # JSON Lines (one object per line — the raw-web-corpus
        # interchange format).  Spark's json reader is line-delimited
        # by default, splittable, and pushes column pruning into the
        # parse, so unprojected fields are never materialized.  Pass
        # ``schema`` on big corpora: inference is its own full scan,
        # and lookalike values ('007') infer to the wrong type.
        if snapshot_id is not None:
            raise ValueError("snapshot_id requires an Iceberg source")
        return spark.read.json(source, schema=schema)
    if fmt == "csv":
        if snapshot_id is not None:
            raise ValueError("snapshot_id requires an Iceberg source")
        if schema is not None:
            return spark.read.csv(source, header=True, schema=schema)
        return spark.read.csv(source, header=True, inferSchema=True)
    if fmt == "auto":
        if os.path.isdir(source) and _is_iceberg_dir(source):
            return read_table(spark, source, fmt="iceberg", snapshot_id=snapshot_id)
        low = source.lower()
        if low.endswith((".jsonl", ".json", ".jsonl.gz", ".json.gz")):
            return read_table(spark, source, fmt="jsonl")
        if low.endswith((".csv", ".csv.gz")):
            return read_table(spark, source, fmt="csv")
        looks_like_table = "/" not in source and source.count(".") >= 1
        if looks_like_table:
            reader = spark.read.format("iceberg")
            if snapshot_id is not None:
                reader = reader.option("snapshot-id", str(snapshot_id))
            try:
                return reader.load(source)
            except Exception:
                if snapshot_id is not None:
                    raise ValueError(
                        f"cannot honor snapshot_id={snapshot_id}: iceberg "
                        f"format unavailable for table {source!r}"
                    )
                return spark.read.table(source)
        if snapshot_id is not None:
            raise ValueError("snapshot_id requires an Iceberg source")
        return spark.read.parquet(source)
    raise ValueError(f"unknown format {fmt!r}")


def write_table(
    df: DataFrame,
    target: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "iceberg":
        w.format("iceberg").saveAsTable(target)
    else:
        w.parquet(target)
