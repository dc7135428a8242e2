"""Input/output: Iceberg-first table reader with parquet fallback.

The production target is an Iceberg table of ~10^12 pre-tokenized
sequences (north rule).  Iceberg gives snapshot-consistent scans,
partition pruning and file-level split planning for free through the
Spark DataSource V2 API — the reader below uses it whenever the
``iceberg`` format is available in the session, and falls back to plain
parquet directories (the only format in this sandbox) otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_table(
    spark: SparkSession,
    source: str,
    fmt: str = "auto",
) -> DataFrame:
    """Read ``source`` as a DataFrame.

    fmt="iceberg": catalog table name (``cat.db.tbl``) or metadata path.
    fmt="parquet": file/directory path.
    fmt="auto": try Iceberg when the name looks like a catalog table,
    else parquet.
    """
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(source)
    if fmt == "parquet":
        return spark.read.parquet(source)
    if fmt == "auto":
        looks_like_table = "/" not in source and source.count(".") >= 1
        if looks_like_table:
            try:
                return spark.read.format("iceberg").load(source)
            except Exception:
                return spark.read.table(source)
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
