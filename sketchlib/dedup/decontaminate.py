"""Benchmark decontamination: drop training documents that share
word n-gram shingles with an evaluation corpus (the standard guard
against test-set leakage in pretraining data).

Two methods, one semantics knob (``threshold`` = how many shared
shingles convict a document):

* ``method="exact"``: literal string shingles built in Catalyst
  (``transform(sequence(...), i -> array_join(slice(words, i+1, w)))``,
  no Python), distinct eval shingles equi-joined against the exploded
  train shingles, conviction on the count of DISTINCT shared shingles.
  One shuffle keyed by shingle (AQE splits boilerplate hot shingles) +
  one by doc id.  Deterministic and engine-reproducible — the gate
  query verifies it against a pure-SQL DuckDB oracle.
* ``method="bloom"``: the eval shingle set is folded into a Bloom
  filter (our core/bloom.py, built distributed) that ships broadcast
  into a vectorized Arrow probe over the train side — ZERO shuffle on
  the train corpus, the 100-TB path.  Bloom false positives and
  instance (not distinct) counting both err toward REMOVING a doc,
  never toward leaking one: no false negatives means every truly
  contaminated doc above threshold is caught.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sketchlib.core.bloom import BloomFilter


def word_shingles(col: str, w: int):
    """Array of the ``w``-word shingle STRINGS of a whitespace-split
    text column (empty array below ``w`` words) — pure Catalyst."""
    words = F.split(F.col(col), " ")
    return F.when(
        F.size(words) >= w,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - w),
            lambda i: F.array_join(F.slice(words, i + 1, w), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    shingle_w: int = 5,
    threshold: int = 1,
    method: str = "exact",
    fpr: float = 1e-6,
    return_contaminated: bool = False,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Return the rows of ``train`` sharing fewer than ``threshold``
    ``shingle_w``-word shingles with ``eval_df`` (or only the
    contaminated rows with ``return_contaminated=True``).  Documents
    shorter than ``shingle_w`` words have no shingles and always
    survive."""
    if threshold < 1:
        raise ValueError(f"threshold must be >= 1, got {threshold}")
    if method not in ("exact", "bloom"):
        raise ValueError(f"unknown method {method!r}")
    sh = word_shingles(col, shingle_w)
    ev = eval_df.select(F.explode(sh).alias("__sh")).distinct()
    if method == "exact":
        tr = train.select(
            F.col(id_col).alias("__did"), F.explode(sh).alias("__sh")
        )
        # eval corpora are small by the nature of the op (benchmarks):
        # broadcasting the distinct eval shingles keeps the (huge)
        # exploded train side out of the join shuffle entirely; pass
        # broadcast_eval=False for an unusually large eval set and let
        # AQE pick the strategy
        ev_side = F.broadcast(ev) if broadcast_eval else ev
        bad = (
            tr.join(ev_side, "__sh")
            .groupBy("__did")
            .agg(F.countDistinct("__sh").alias("__hits"))
            .filter(F.col("__hits") >= threshold)
            .select(F.col("__did").alias(id_col))
        )
        how = "left_semi" if return_contaminated else "left_anti"
        return train.join(bad, id_col, how)

    # bloom: distributed build over the (hashed) eval shingles, then a
    # broadcast vectorized probe per train row — no train-side shuffle
    from sketchlib.spark.api import build_bloom

    n_eval = ev.count()  # eval corpora are small next to train
    bloom = build_bloom(ev, "__sh", capacity=max(n_eval, 1), fpr=fpr)
    blob = bloom.to_bytes()
    cols = train.columns
    hashed = train.select(
        *cols, F.transform(sh, lambda s: F.xxhash64(s)).alias("__hs")
    )

    def fn(batches):
        bf = BloomFilter.from_bytes(blob)
        for b in batches:
            la = b.column(len(cols))
            if isinstance(la, pa.ChunkedArray):  # pragma: no cover
                la = la.combine_chunks()
            offs = la.offsets.to_numpy()
            flat = la.values.to_numpy(zero_copy_only=False)
            hits_flat = bf.contains_hashes(flat).astype(np.int64)
            csum = np.concatenate(([0], np.cumsum(hits_flat)))
            per_doc = csum[offs[1:]] - csum[offs[:-1]]
            keep = per_doc < threshold
            if return_contaminated:
                keep = ~keep
            yield pa.RecordBatch.from_arrays(
                [b.column(i).filter(pa.array(keep)) for i in range(len(cols))],
                names=cols,
            )

    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in train.schema.fields
    )
    return hashed.mapInArrow(fn, schema)
