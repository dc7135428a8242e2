"""Text normalization and passage splitting — the preprocessing steps
that run BEFORE dedup/quality/tokenization so that byte-level noise
(case, Unicode composition, whitespace) never masks a duplicate or
skews a count.

Spark-first shape: everything except Unicode NFC is pure Catalyst
(lower / regexp_replace / trim on the scan, whole-stage codegen);
NFC has no Spark builtin, so that one step is a vectorized pandas
kernel (``Series.str.normalize``) — skipped entirely when
``nfc=False``."""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


@F.pandas_udf(StringType())
def _nfc_udf(s: pd.Series) -> pd.Series:
    return s.str.normalize("NFC")


def normalize_text(
    df: DataFrame,
    col: str = "text",
    out_col: str | None = None,
    lowercase: bool = True,
    nfc: bool = True,
    collapse_whitespace: bool = True,
    strip: bool = True,
) -> DataFrame:
    """Append (or replace, when ``out_col`` is None) the normalized
    form of a text column: lowercase -> Unicode NFC -> collapse runs
    of whitespace to one space -> trim.  Deterministic and idempotent;
    order matters and matches the common dedup recipe (NFC after
    lowercasing so decomposed uppercase still composes).

    100-TB shape: one map-side pass on the scan, no shuffle.  With
    ``nfc=False`` the whole expression is Catalyst (codegen'd); NFC
    adds one Arrow-batched pandas kernel."""
    target = out_col if out_col is not None else col
    if out_col is not None and out_col in df.columns:
        raise ValueError(f"output column {out_col!r} already exists")
    expr = F.col(col)
    if lowercase:
        expr = F.lower(expr)
    if nfc:
        expr = _nfc_udf(expr)
    if collapse_whitespace:
        expr = F.regexp_replace(expr, "[ \\t\\n\\r]+", " ")
    if strip:
        expr = F.trim(expr)
    return df.withColumn(target, expr)


def split_passages(
    df: DataFrame,
    col: str = "text",
    sep: str = "\n\n",
    passage_col: str = "passage",
    index_col: str = "passage_idx",
    keep_empty: bool = False,
) -> DataFrame:
    """Explode a document column into its passages on a LITERAL
    separator: one output row per passage, carrying every other input
    column plus a 1-based ``index_col`` (the passage's position in its
    document — SQL ``generate_subscripts`` numbering) and the
    ``passage_col`` text.  Consecutive separators produce empty
    passages, dropped unless ``keep_empty`` (their indexes still count
    the dropped slots, so surviving passages keep stable positions).

    The chunking step for passage-level dedup (compose with
    ``dedup/*``), retrieval corpora, and context-window packing.
    100-TB shape: split + posexplode on the scan — no shuffle; output
    rows stay co-partitioned with their document."""
    for c in (passage_col, index_col, "__pos"):
        if c in df.columns:
            raise ValueError(f"output column {c!r} already exists")
    if not sep:
        raise ValueError("sep must be non-empty")
    # F.split takes a REGEX; quote the literal separator
    parts = F.split(F.col(col), re.escape(sep))
    out = df.select(
        "*", F.posexplode(parts).alias("__pos", passage_col)
    ).withColumn(index_col, (F.col("__pos") + F.lit(1)).cast("long"))
    out = out.drop("__pos", col)
    if not keep_empty:
        out = out.filter(F.col(passage_col) != "")
    return out
