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
    The persisted output is ALWAYS materialized eagerly with one
    action: the metric fires EXACTLY once (a lazily-cached frame read
    by both self-join sides can compute the same partition twice on
    different executors and double-count), and the input's transient
    cache can be released before returning."""
    # persist the INPUT first: its upstream usually contains a Python
    # UDF (signatures), and both the sizes aggregation and the join
    # back read it — without this the UDF would execute twice
    src = df.persist()
    sizes = src.groupBy(*bucket_cols).agg(F.count(F.lit(1)).alias("_bsz"))
    # join back with NULL-SAFE equality: a null bucket key must keep
    # its members (a plain equi-join would silently drop them — the
    # exact silent-recall-hole class this guard exists to prevent);
    # rename the size side's keys to avoid ambiguous columns
    sizes = sizes.select(
        *[F.col(c).alias(f"__bk_{i}") for i, c in enumerate(bucket_cols)],
        "_bsz",
    )
    cond = None
    for i, c in enumerate(bucket_cols):
        eq = src[c].eqNullSafe(sizes[f"__bk_{i}"])
        cond = eq if cond is None else (cond & eq)
    nchunks = F.ceil(F.col("_bsz") / F.lit(max_bucket)).cast("int")
    split = src.join(sizes, cond).withColumn(
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
    # always materialize: fills the observation exactly once AND lets
    # the input's cache be released before returning (the output is
    # self-contained; callers self-join it repeatedly)
    split.count()
    src.unpersist()
    return split
