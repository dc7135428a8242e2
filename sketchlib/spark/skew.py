"""Hot-bucket sub-splitting — the shared skew guard of the bucketed
similarity joins (LSH band buckets, IVF centroid buckets).

A self-join inside buckets emits ~B^2/2 pairs from a bucket of B
members; at 100-TB scale a boilerplate band bucket or a dense embedding
cluster makes B millions.  ``sub_split_buckets`` chunks each bucket into
ceil(B / max_bucket) sub-buckets (pair volume ~B * max_bucket) WITHOUT
dropping anyone — the chunk assignment is a hash of (id, bucket
columns) mod the chunk count, so different buckets/bands chunk the same
hot set differently and the chunk-split cliques re-chain under
connected components.

The chunk assignment deliberately avoids a per-bucket window: a
``row_number over Window.partitionBy(bucket)`` would ship a 100M-member
hot bucket to ONE task (windows cannot be skew-split).  Instead bucket
sizes come from a ``groupBy(bucket).count`` — map-side partial
aggregation collapses the hot bucket to one row per task — and the
join back is an equi-join AQE can skew-split.  Chunk sizes are
therefore multinomial around ``max_bucket`` (hash-uniform) rather than
exactly ``max_bucket``; the pair-volume bound holds in expectation with
tight concentration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sub_split_buckets(
    df: DataFrame,
    bucket_cols: list[str],
    id_col: str,
    max_bucket: int,
    observation=None,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Add a ``sub`` chunk column within each bucket and persist.

    Returns ``df`` restricted to ``bucket_cols + ["sub", id_col] +
    keep_cols``, persisted (callers self-join it, and its upstream
    usually contains a Python UDF that must not recompute per side).

    ``observation`` (optional ``pyspark.sql.Observation``) receives
    ``overflow_rows`` (memberships beyond the first chunk — what a
    truncating cap would have silently dropped) and ``bucket_rows``.
    When an observation is requested the persisted frame is eagerly
    materialized with one action so the metric fires EXACTLY once — a
    lazily-cached frame read by both self-join sides can compute the
    same partition twice on different executors and double-count."""
    sizes = df.groupBy(*bucket_cols).agg(F.count(F.lit(1)).alias("_bsz"))
    nchunks = F.ceil(F.col("_bsz") / F.lit(max_bucket)).cast("int")
    split = df.join(sizes, list(bucket_cols)).withColumn(
        "sub",
        F.pmod(
            F.xxhash64(F.col(id_col), *[F.col(c) for c in bucket_cols]),
            F.greatest(nchunks, F.lit(1)),
        ).cast("int"),
    )
    if observation is not None:
        split = split.observe(
            observation,
            F.sum((F.col("sub") > 0).cast("long")).alias("overflow_rows"),
            F.count(F.lit(1)).alias("bucket_rows"),
        )
    cols = list(bucket_cols) + ["sub", id_col] + list(keep_cols or [])
    split = split.select(*cols).persist()
    if observation is not None:
        split.count()  # materialize once: exact metrics, no recompute race
    return split
