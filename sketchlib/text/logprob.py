"""Unigram language-model scoring (perplexity-style quality filter).

The classic training-data curation signal (CCNet / Gopher lineage):
score every document by its average per-token log-probability under a
Laplace-smoothed unigram model, then drop or re-weight the tails.
Fits the tokens payload natively — the model is one bounded-size count
table and the scoring pass is embarrassingly parallel.

Semantics (fixed, so an ANSI-SQL oracle can reproduce them exactly):

    lp(w)       = ln( (c(w) + 1) / (N + V + 1) )        Laplace add-one
    oov         = ln(        1   / (N + V + 1) )        unseen terms
    avg_logprob = mean over the row's terms of lp       NULL if 0 terms

where ``c`` is the model's term count, ``N = sum c`` and ``V`` the
model vocabulary size; the ``+1`` in the denominator is the reserved
OOV bucket, so the smoothed distribution sums to exactly 1.  Text mode
terms are whitespace tokens (``split(trim(col), '\\s+')`` minus
empties — the `with_token_stats` convention); tokens mode terms are
the int32 token ids themselves.

Plans (both single-scan on the scoring side):

* **broadcast kernel** (default, vocab <= ``vocab_broadcast_max``):
  the count table is collected once (bounded by the vocab guard, NOT
  by the corpus size) and shipped as a broadcast lookup — a dict for
  text, a dense ``float64[max_id+1]`` array for tokens.  Scoring is a
  vectorized Arrow/pandas kernel appended to the input scan: ZERO
  shuffle, so the stage scales linearly with executors at any corpus
  size.
* **join plan** (text mode, vocab above the guard): explode -> join
  the count frame on the term -> re-group by ``id_col``.  Two
  shuffles, but no driver materialization of the vocabulary — the
  web-text escape hatch where distinct words outgrow a broadcast.

Model reuse: ``unigram_counts`` returns the (term, n) frame; pass it
as ``model_counts`` to score one corpus under another's model (the
CCNet setup — score the crawl under a clean-reference model).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: dense tokens-mode lookup guard: float64 entries (8 B each); 4M ids
#: = 32 MB broadcast — comfortably above any real BPE vocab (<=256k)
#: while refusing runaway id spaces (hash-valued "ids") early.
MAX_TOKEN_ID = 4_000_000

_TERMS_EXPR = "filter(split(trim({col}), '\\\\s+'), x -> x != '')"


def _terms_col(col: str):
    """Whitespace terms of a text column, empties dropped (matches the
    pandas kernel's ``str.split()`` and the oracle's regexp split)."""
    return F.expr(_TERMS_EXPR.format(col=col))


def unigram_counts(df: DataFrame, col: str = "text", tokens: bool = False) -> DataFrame:
    """Term-frequency table ``(term, n)`` of a corpus — the unigram
    model.  Text mode explodes whitespace terms (map-side combine
    keeps the shuffle at vocab size, not corpus size); tokens mode
    flattens the int32 arrays executor-side via Arrow list offsets
    and pre-aggregates each batch with ``np.bincount`` before the
    (vocab-sized) final groupBy."""
    if not tokens:
        return (
            df.select(F.explode(_terms_col(col)).alias("term"))
            .groupBy("term")
            .count()
            .withColumnRenamed("count", "n")
        )

    def fn(it):
        for batch in it:
            arr = batch.column(0)
            if arr.null_count:
                arr = arr.drop_null()
            flat = arr.flatten()  # zero-copy over list offsets
            if flat.null_count:
                flat = flat.drop_null()
            ids = flat.to_numpy(zero_copy_only=False)
            if len(ids) == 0:
                continue
            if ids.min() < 0 or ids.max() > MAX_TOKEN_ID:
                raise ValueError(
                    f"token ids must be in [0, {MAX_TOKEN_ID}] for the dense "
                    f"count path, got [{ids.min()}, {ids.max()}]"
                )
            counts = np.bincount(ids)
            nz = np.flatnonzero(counts)
            yield pa.RecordBatch.from_arrays(
                [pa.array(nz.astype(np.int64)), pa.array(counts[nz].astype(np.int64))],
                names=["term", "n"],
            )

    partial = df.select(col).mapInArrow(fn, "term bigint, n bigint")
    return partial.groupBy("term").agg(F.sum("n").alias("n"))


#: internal count frame persisted by the most recent join-plan
#: unigram_logprob call — the shared one-slot contract (cache.py)
_counts_cache = None


def _get_counts_cache():
    global _counts_cache
    if _counts_cache is None:
        from sketchlib.spark.cache import SingleSlotCache

        _counts_cache = SingleSlotCache()
    return _counts_cache


def release_logprob_cache() -> None:
    """Unpersist the internal count frame cached by the most recent
    join-plan :func:`unigram_logprob` call (no-op when none is held).
    Called automatically at the start of every self-model run, so
    loops over corpora hold at most one cached frame; call it
    explicitly once the last returned frame has been materialized.
    Releasing early is always safe — an unevaluated consumer just
    recomputes the counts instead of reading the cache."""
    _get_counts_cache().release()


def _model_stats(counts: DataFrame) -> tuple[int, int]:
    row = counts.agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("N"),
        F.count(F.lit(1)).alias("V"),
    ).first()
    return int(row["N"]), int(row["V"])


def unigram_logprob(
    df: DataFrame,
    col: str = "text",
    *,
    tokens: bool = False,
    model_counts: DataFrame | None = None,
    id_col: str | None = None,
    vocab_broadcast_max: int = 4_000_000,
) -> DataFrame:
    """Append ``n_terms`` and ``avg_logprob`` (Laplace-smoothed
    average unigram log-probability) to every row of ``df``.

    ``model_counts`` — a ``unigram_counts`` frame — scores ``df``
    under an external model (terms unseen by the model get the OOV
    log-prob); omitted, the model is built from ``df`` itself.  Rows
    with zero terms (empty/NULL) get ``n_terms = 0`` and NULL score.

    Text mode falls back to the explode+join plan when the vocabulary
    exceeds ``vocab_broadcast_max`` (requires ``id_col`` — a unique
    row key to re-attach scores); tokens mode is broadcast-only (BPE
    id spaces are bounded) and refuses ids above ``MAX_TOKEN_ID``.
    """
    own_counts = model_counts is None
    counts = model_counts if not own_counts else unigram_counts(df, col, tokens)
    if own_counts:
        # one corpus-scale explode+groupBy feeds BOTH the (N, V) stats
        # job and the collect/join below — persist so it runs once
        release_logprob_cache()
        counts = counts.persist()
    n_total, vocab = _model_stats(counts)
    denom = float(n_total + vocab + 1)
    oov = -math.log(denom)

    if tokens:
        pdf = counts.toPandas()  # bounded: one row per vocab entry
        if own_counts:
            counts.unpersist()  # collected — the cache is spent
        ids = pdf["term"].to_numpy()
        if len(ids) and (ids.min() < 0 or ids.max() > MAX_TOKEN_ID):
            raise ValueError(
                f"model token ids outside [0, {MAX_TOKEN_ID}]; dense lookup "
                "refused — remap ids or use text mode's join plan"
            )
        table = np.full(int(ids.max()) + 1 if len(ids) else 1, oov)
        table[ids] = np.log((pdf["n"].to_numpy() + 1.0) / denom)
        return _score_tokens_arrow(df, col, table, oov)

    if vocab <= vocab_broadcast_max:
        pdf = counts.toPandas()
        if own_counts:
            counts.unpersist()  # collected — the cache is spent
        lp = dict(
            zip(pdf["term"], np.log((pdf["n"].to_numpy() + 1.0) / denom))
        )
        return _score_text_pandas(df, col, lp, oov)

    if id_col is None:
        if own_counts:
            counts.unpersist()
        raise ValueError(
            f"vocabulary ({vocab}) exceeds vocab_broadcast_max "
            f"({vocab_broadcast_max}); the explode+join plan needs id_col= "
            "(a unique row key) to re-attach scores"
        )
    if own_counts:
        # the returned plan still references the frame lazily: hand the
        # cache to the release slot (tfidf pattern) instead of leaking
        _get_counts_cache().hold(counts)
    return _score_text_join(df, col, counts, id_col, denom, oov)


def _score_tokens_arrow(df: DataFrame, col: str, table: np.ndarray, oov: float) -> DataFrame:
    """Zero-shuffle tokens scoring: dense broadcast lookup + segmented
    sums over the Arrow list offsets (cumsum-diff handles empty rows
    without the reduceat empty-segment pitfall)."""
    names = df.columns
    ci = names.index(col)

    def fn(it):
        import pyarrow.compute as pc

        for batch in it:
            arr = batch.column(ci)
            # per-row lengths (0 for NULL rows; NULL elements still
            # counted here) drive the segmented sums; flatten() emits
            # only the valid rows' values, in row order, so the two
            # stay aligned
            lens = (
                pc.list_value_length(arr)
                .fill_null(0)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            flat = arr.flatten()
            if flat.null_count:
                # NULL elements inside an array: ignored, matching the
                # unigram_counts drop_null — excluded from both the
                # sum and n_terms (a bare to_numpy would promote the
                # ids to float NaN and crash the table lookup)
                valid = ~flat.is_null().to_numpy(zero_copy_only=False)
                ids = flat.fill_null(0).to_numpy(zero_copy_only=False)
            else:
                valid = None
                ids = flat.to_numpy(zero_copy_only=False)
            lp = np.where(
                (ids >= 0) & (ids < len(table)),
                table[np.clip(ids, 0, len(table) - 1)],
                oov,
            )
            ends = np.cumsum(lens)
            starts = ends - lens
            if valid is not None:
                lp = np.where(valid, lp, 0.0)
                vcs = np.concatenate(([0], np.cumsum(valid.astype(np.int64))))
                n_terms = (vcs[ends] - vcs[starts]).astype(np.int32)
            else:
                n_terms = lens.astype(np.int32)
            cs = np.concatenate(([0.0], np.cumsum(lp)))
            with np.errstate(invalid="ignore", divide="ignore"):
                avg = (cs[ends] - cs[starts]) / np.maximum(n_terms, 1)
            avg = np.where(n_terms > 0, avg, np.nan)
            yield pa.RecordBatch.from_arrays(
                [batch.column(i) for i in range(batch.num_columns)]
                + [pa.array(n_terms), pa.array(avg, from_pandas=True)],
                names=list(batch.schema.names) + ["n_terms", "avg_logprob"],
            )

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInArrow(fn, f"{schema}, n_terms int, avg_logprob double")


def _score_text_pandas(df: DataFrame, col: str, lp: dict, oov: float) -> DataFrame:
    """Zero-shuffle text scoring, fully vectorized (advisor r7 A/B —
    the former per-term Python loop won only at tiny batches): the
    whitespace split runs in Arrow's RE2 kernel, terms are
    dictionary-encoded per batch so the broadcast dict is hit once per
    DISTINCT term instead of once per occurrence, and the per-row sums
    are the same segmented cumsum-diff the tokens kernel uses.

    Tokenization parity: Java regex \\s = [ \\t\\n\\x0b\\f\\r] (the
    Catalyst split the oracle mirrors); RE2 \\s EXCLUDES \\x0b and
    Python's str.split() is unicode-aware — all paths pin the explicit
    ASCII class so exotic-whitespace inputs agree.  Boundary-adjacent
    splits yield empty strings in BOTH re.split and RE2 split — they
    are not terms and are masked out of count and sum."""
    names = df.columns
    ci = names.index(col)

    def fn(it):
        import pyarrow.compute as pc

        get = lp.get
        for batch in it:
            arr = batch.column(ci)
            parts = pc.split_pattern_regex(arr, "[ \t\n\x0b\f\r]+")
            lens = (
                pc.list_value_length(parts)
                .fill_null(0)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            denc = parts.flatten().dictionary_encode()
            uniq = denc.dictionary.to_pylist()
            lp_u = np.fromiter(
                (get(w, oov) for w in uniq), dtype=np.float64, count=len(uniq)
            )
            keep_u = np.fromiter(
                (w != "" for w in uniq), dtype=bool, count=len(uniq)
            )
            idx = denc.indices.to_numpy(zero_copy_only=False)
            keep = keep_u[idx]
            vals = np.where(keep, lp_u[idx], 0.0)
            ends = np.cumsum(lens)
            starts = ends - lens
            kcs = np.concatenate(([0], np.cumsum(keep.astype(np.int64))))
            n_terms = (kcs[ends] - kcs[starts]).astype(np.int32)
            # per-row sums via reduceat, NOT a global cumsum-diff: the
            # running-sum formulation makes a row's float sum depend on
            # its BATCH position, so byte-identical docs in different
            # replicas scored unequally (caught by stress_score's
            # replica-identity invariant).  reduceat applies + strictly
            # left-to-right per segment — bit-identical to the former
            # per-row Python loop (masked empties add exact 0.0; lp
            # values are strictly negative, so no -0.0 edge).
            sums = np.zeros(lens.size, dtype=np.float64)
            ne = np.flatnonzero(lens > 0)
            if vals.size:
                sums[ne] = np.add.reduceat(vals, starts[ne])
            with np.errstate(invalid="ignore", divide="ignore"):
                avg = sums / np.maximum(n_terms, 1)
            avg = np.where(n_terms > 0, avg, np.nan)
            yield pa.RecordBatch.from_arrays(
                [batch.column(i) for i in range(batch.num_columns)]
                + [pa.array(n_terms), pa.array(avg, from_pandas=True)],
                names=list(batch.schema.names) + ["n_terms", "avg_logprob"],
            )

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.mapInArrow(fn, f"{schema}, n_terms int, avg_logprob double")


def _score_text_join(
    df: DataFrame, col: str, counts: DataFrame, id_col: str, denom: float, oov: float
) -> DataFrame:
    """Explode -> left join the count frame -> re-group: no driver
    vocabulary materialization (web-scale distinct-word counts)."""
    ex = df.select(id_col, F.explode(_terms_col(col)).alias("term"))
    scored = (
        ex.join(counts, "term", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.avg(
                F.coalesce(
                    F.log((F.col("n") + 1) / F.lit(denom)), F.lit(oov)
                )
            ).alias("avg_logprob"),
        )
    )
    out = df.join(scored, id_col, "left")
    return out.withColumn(
        "n_terms", F.coalesce(F.col("n_terms"), F.lit(0)).cast("int")
    )


def logprob_oracle_sql(table: str, col: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB SQL reproducing text-mode self-model scoring exactly
    (rows with >= 1 term), ``avg_logprob`` rounded to 4 dp — the
    cross-engine float convention."""
    return f"""
WITH terms AS (
  SELECT {id_col}, t
  FROM (
    SELECT {id_col},
           unnest(regexp_split_to_array(trim({col}),
                                        '[ \\t\\n\\x0b\\f\\r]+')) AS t
    FROM {table}
  )
  WHERE t <> ''
),
c AS (SELECT t, count(*)::BIGINT AS n FROM terms GROUP BY t),
tot AS (SELECT sum(n) AS N, count(*) AS V FROM c)
SELECT terms.{id_col},
       count(*)::INT AS n_terms,
       round(avg(ln((c.n + 1) / (tot.N + tot.V + 1.0))), 4) AS avg_logprob
FROM terms JOIN c USING (t), tot
GROUP BY terms.{id_col}
""".strip()
