"""Cross-run incremental deduplication: dedupe TODAY's batch against
everything ingested on previous runs WITHOUT rescanning the historical
corpus.

The seen-state is a Bloom filter over the key column (our
core/bloom.py — mergeable, serializable, hash-domain guarded), built
distributed on the first run and UPDATED incrementally: each run folds
its own batch's keys into the state and persists the new bytes next to
its output.  Filtering is a broadcast vectorized probe — zero shuffle
over the new batch, the same plan shape at 1 GB and 100 TB.

Guarantee direction: Bloom false positives DROP a genuinely-new row
(at the configured fpr) but NEVER readmit a seen one — the right
asymmetry for training-data dedup, where a duplicate leaking in costs
more than one fresh document dropped.  For exact semantics on modest
key domains use ``method="exact"`` in dedup/exact.py against the
stored keys instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sketchlib.core.bloom import BloomFilter


def build_seen_state(
    df: DataFrame,
    col: str,
    capacity: int | None = None,
    fpr: float = 1e-4,
) -> BloomFilter:
    """Distributed Bloom build over the key column (JVM-side xxhash64,
    mergeable partials).  ``capacity`` defaults to one count of the
    input — pass the expected TOTAL corpus size for a state that will
    absorb many future batches without fpr drift."""
    from sketchlib.spark.api import build_bloom

    if capacity is None:
        capacity = max(df.count(), 1)
    return build_bloom(df, col, capacity=capacity, fpr=fpr)


def filter_unseen(
    df: DataFrame, col: str, state: BloomFilter | bytes
) -> DataFrame:
    """Rows of ``df`` whose key is NOT in the seen-state (broadcast
    probe, no shuffle).  NULL keys are never 'seen' and pass through
    (they carry no dedup identity)."""
    bloom = (
        BloomFilter.from_bytes(state) if isinstance(state, bytes) else state
    )
    from sketchlib.spark.api import bloom_contains

    probed = bloom_contains(df, col, bloom, out_col="__seen")
    return probed.filter(
        F.col(col).isNull() | ~F.col("__seen")
    ).drop("__seen")


def ingest_batch(
    df: DataFrame,
    col: str,
    state: BloomFilter | bytes | None,
    capacity: int | None = None,
    fpr: float = 1e-4,
) -> tuple[DataFrame, BloomFilter]:
    """One incremental-dedup step: returns (fresh rows of ``df`` not
    seen in ``state``, the UPDATED state including this batch's keys).
    ``state=None`` starts a new corpus (``capacity``/``fpr`` size the
    NEW filter; on later runs the geometry is INHERITED from the old
    filter — merging requires identical m/k — so passing them with an
    existing state raises instead of being silently ignored).  The
    updated state is the MERGE of the old filter with a filter built
    over the fresh rows — both sides distributed, the merge a
    driver-side bit-or — so a pipeline can persist
    ``state.to_bytes()`` per run and resume tomorrow.  Within-batch
    duplicates are collapsed by the exact hash group-by of dedup/exact
    semantics first (a Bloom cannot distinguish a batch's own first
    occurrence from its repeats).

    The returned frame is PERSISTED: the state fold already
    materialized it, so the caller's own write/collect reads the cache
    instead of re-running the dedup shuffle and probe (one cached
    frame per call, released at session end or by the caller's
    unpersist)."""
    first_per_key = df.filter(F.col(col).isNull()).unionByName(
        df.filter(F.col(col).isNotNull()).dropDuplicates([col])
    )
    if state is None:
        fresh = first_per_key.persist()
        if capacity is None:
            capacity = max(fresh.filter(F.col(col).isNotNull()).count(), 1)
        new_state = build_seen_state(
            fresh.filter(F.col(col).isNotNull()), col,
            capacity=capacity, fpr=fpr,
        )
        return fresh, new_state
    if capacity is not None or fpr != 1e-4:
        raise ValueError(
            "capacity/fpr only apply when starting a new state: the "
            "updated filter must keep the existing state's geometry "
            "(m/k) to merge with it"
        )
    bloom = (
        BloomFilter.from_bytes(state) if isinstance(state, bytes) else state
    )
    fresh = filter_unseen(first_per_key, col, bloom).persist()
    batch_bloom = BloomFilter(m_bits=bloom.m, k=bloom.k)
    built = _fold_keys(fresh.filter(F.col(col).isNotNull()), col, batch_bloom)
    merged = BloomFilter.from_bytes(bloom.to_bytes()).merge(built)
    return fresh, merged


def _fold_keys(df: DataFrame, col: str, proto: BloomFilter) -> BloomFilter:
    """Build a Bloom with the PROTO's exact geometry over df's keys
    (geometries must match for the cross-run merge)."""
    from sketchlib.spark.aggregate import KIND_HASH64, sketch_column

    sk = sketch_column(
        df, col, lambda: BloomFilter(m_bits=proto.m, k=proto.k),
        KIND_HASH64, collect_threshold=32,
    )
    return sk if sk is not None else proto
