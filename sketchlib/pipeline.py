"""End-to-end training-data curation pipeline.

Composes the library's operators into the standard curation flow:

  annotate (token stats + quality + language)   [Catalyst expressions]
    -> quality filter                           [pushed-down predicate]
    -> exact dedup                              [hash-groupBy, keep min id]
    -> MinHash+LSH near-dedup                   [keep the smaller id of a pair]
    -> summary sketches over the survivors      [single scan, all sketches]

Returns (curated DataFrame, report dict).  Every drop decision keeps
the minimum id, so the pipeline is deterministic and idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from sketchlib.core.hll import HyperLogLog
from sketchlib.core.tdigest import TDigest
from sketchlib.dedup.exact import exact_duplicate_groups
from sketchlib.dedup.minhash import minhash_near_duplicates
from sketchlib.spark.aggregate import KIND_DOUBLE, KIND_HASH64, sketch_columns
from sketchlib.text.analysis import language_id, with_quality, with_token_stats


def curate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    quality_min: float = 0.2,
    near_dup_threshold: float = 0.7,
    annotate_language: bool = True,
    run_near_dedup: bool = True,
) -> tuple[DataFrame, dict]:
    """Run the curation flow; returns (curated_df, report).

    All four stage row-counts ride ``observe()`` metric nodes on the
    lineage of the ONE materializing action (the final sketch scan) —
    the former four separate ``count()`` actions re-scanned
    progressively filtered data four times, which at 100 TB is four
    redundant passes."""
    annotated = with_quality(with_token_stats(docs, text_col), text_col)
    if annotate_language:
        annotated = language_id(annotated, text_col)

    # input + post-filter counts share one metric node (1:1 transforms
    # above mean rows(annotated) == rows(docs))
    obs_in = Observation()  # anonymous: auto-unique name, safe when a curate
    # output feeds another curate (lineage carries old metric nodes)
    annotated = annotated.observe(
        obs_in,
        F.count(F.lit(1)).alias("input_rows"),
        F.sum(
            (F.col("quality_score") >= quality_min).cast("long")
        ).alias("after_quality_filter"),
    )
    filtered = annotated.filter(F.col("quality_score") >= quality_min)

    # exact dedup: drop every member except the minimum id
    groups = exact_duplicate_groups(filtered, col=text_col, id_col=id_col)
    drop_exact = groups.select(
        F.explode(F.slice("ids", 2, 1_000_000)).alias(id_col)
    )
    obs_exact = Observation()
    deduped = filtered.join(drop_exact, id_col, "anti").observe(
        obs_exact, F.count(F.lit(1)).alias("after_exact_dedup")
    )

    if run_near_dedup:
        pairs = minhash_near_duplicates(
            deduped, col=text_col, id_col=id_col, threshold=near_dup_threshold
        )
        drop_near = pairs.select(
            F.greatest("id_a", "id_b").alias(id_col)
        ).distinct()
        curated = deduped.join(drop_near, id_col, "anti")
    else:
        curated = deduped
    obs_near = Observation()
    curated = curated.observe(
        obs_near, F.count(F.lit(1)).alias("after_near_dedup")
    )

    sketches = sketch_columns(
        curated,
        {
            "quality_score": (lambda: TDigest(delta=500), KIND_DOUBLE),
            "ws_tokens": (lambda: TDigest(delta=500), KIND_DOUBLE),
            id_col: (lambda: HyperLogLog(p=13), KIND_HASH64),
        },
    )
    # the sketch scan above is the action that filled every metric
    report: dict = {**obs_in.get, **obs_exact.get, **obs_near.get}
    report["after_quality_filter"] = int(report["after_quality_filter"] or 0)
    report["quality_p50"] = float(sketches["quality_score"].value_at_quantile(0.5))
    report["ws_tokens_p50"] = float(sketches["ws_tokens"].value_at_quantile(0.5))
    report["ws_tokens_p99"] = float(sketches["ws_tokens"].value_at_quantile(0.99))
    report["distinct_ids_est"] = float(sketches[id_col].estimate())
    report["sketches"] = {k: v.to_bytes() for k, v in sketches.items()}
    return curated, report
