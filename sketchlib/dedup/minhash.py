"""MinHash + LSH near-duplicate detection.

Pipeline (the standard large-scale shape):
  1. signatures: per document, word shingles -> 64-bit shingle hashes
     -> ``num_perm`` MinHash values (pandas UDF; per-batch numpy, the
     per-permutation min is one vectorized reduction).
  2. banding: split each signature into ``bands`` of ``rows_per_band``
     values; hash each band JVM-side (``xxhash64`` on the array slice)
     and explode -> (band_idx, band_hash, id).
  3. bucket join: group by (band_idx, band_hash); every bucket with
     >= 2 members emits its member pairs (bucket sizes are bounded by
     ``max_bucket`` against degenerate all-equal buckets — the skew
     guard for this operator).
  4. verify: candidate pairs join back to their shingle sets; exact
     Jaccard >= threshold keeps the pair.

Probability a pair with Jaccard s collides in >= 1 band:
1 - (1 - s^r)^b — with b=16, r=4 the S-curve crosses ~0.5 near
s ~= 0.5, which is the classic near-dup operating point.

Two input modes: ``text`` (whitespace words, hashed with blake2b —
fine at test scale) and pre-tokenized ``array<int>`` columns (fully
vectorized splitmix64 — the 10^12-token-scale path; tokenize once,
dedup many times).
"""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from sketchlib.core.hashing import hash_str, splitmix64

_U64 = np.uint64


def _word_shingle_hashes(text: str, w: int, seed: int) -> np.ndarray:
    words = text.split()
    if not words:
        return np.zeros(1, dtype=np.uint64)
    if len(words) < w:
        return hash_str([" ".join(words)], seed=seed)
    wh = hash_str(words, seed=seed)
    n = len(words) - w + 1
    acc = wh[:n].copy()
    for i in range(1, w):
        with np.errstate(over="ignore"):
            acc = splitmix64(acc ^ (wh[i : i + n] * _U64(0x9E3779B97F4A7C15)))
    return np.unique(acc)


def _token_shingle_hashes(tokens: np.ndarray, w: int, seed: int) -> np.ndarray:
    t = np.asarray(tokens, dtype=np.int64).view(np.uint64)
    if t.size == 0:
        return np.zeros(1, dtype=np.uint64)
    if t.size < w:
        pad = np.zeros(w, dtype=np.uint64)
        pad[: t.size] = t
        t = pad
    th = splitmix64(t ^ _U64(seed & 0xFFFFFFFFFFFFFFFF))
    n = t.size - w + 1
    acc = th[:n].copy()
    for i in range(1, w):
        with np.errstate(over="ignore"):
            acc = splitmix64(acc ^ (th[i : i + n] * _U64(0x9E3779B97F4A7C15)))
    return np.unique(acc)


def _minhash_from_shingles(sh: np.ndarray, num_perm: int, seed: int) -> np.ndarray:
    """num_perm MinHash values via seeded splitmix permutations."""
    seeds = splitmix64(np.arange(num_perm, dtype=np.uint64) + _U64(seed * 7919 + 13))
    with np.errstate(over="ignore"):
        m = splitmix64(sh[None, :] ^ seeds[:, None])  # (num_perm, S)
    return m.min(axis=1).view(np.int64)


def minhash_signatures(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    shingle_w: int = 3,
    seed: int = 1,
    tokens: bool = False,
) -> DataFrame:
    """DataFrame[id, sig array<long>] — MinHash signatures."""

    if tokens:

        @pandas_udf("array<long>")
        def sig_udf(vals: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    _minhash_from_shingles(
                        _token_shingle_hashes(np.asarray(v, dtype=np.int64), shingle_w, seed),
                        num_perm,
                        seed,
                    ).tolist()
                    for v in vals
                ]
            )

    else:

        @pandas_udf("array<long>")
        def sig_udf(vals: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    _minhash_from_shingles(
                        _word_shingle_hashes(v or "", shingle_w, seed), num_perm, seed
                    ).tolist()
                    for v in vals
                ]
            )

    return df.select(F.col(id_col).alias("id"), sig_udf(F.col(col)).alias("sig"))


def lsh_candidate_pairs(
    sig_df: DataFrame,
    bands: int = 16,
    rows_per_band: int = 4,
    max_bucket: int = 64,
) -> DataFrame:
    """DataFrame[id_a, id_b] distinct candidate pairs from band-hash
    buckets.  Band hashes are computed JVM-side (xxhash64 over the
    signature slice).  Buckets larger than ``max_bucket`` are truncated
    (skew guard; a pathological bucket of B members would emit B^2/2
    pairs)."""
    band_hashes = F.array(
        *[
            F.xxhash64(F.slice("sig", b * rows_per_band + 1, rows_per_band))
            for b in range(bands)
        ]
    )
    exploded = (
        sig_df.select("id", F.posexplode(band_hashes).alias("band", "bh"))
    )

    def emit_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(pdf["id"].head(max_bucket))
        pairs = list(itertools.combinations(ids, 2))
        if not pairs:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        a, b = zip(*pairs)
        return pd.DataFrame({"id_a": a, "id_b": b})

    return (
        exploded.groupBy("band", "bh")
        .applyInPandas(emit_pairs, "id_a long, id_b long")
        .distinct()
    )


def exact_jaccard_pairs(
    pairs: DataFrame,
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    shingle_w: int = 3,
    seed: int = 1,
    tokens: bool = False,
) -> DataFrame:
    """Append exact shingle-set Jaccard to candidate pairs:
    DataFrame[id_a, id_b, jaccard]."""
    docs = df.select(F.col(id_col).alias("id"), F.col(col).alias("__v"))
    joined = (
        pairs.join(docs.withColumnRenamed("id", "id_a").withColumnRenamed("__v", "va"), "id_a")
        .join(docs.withColumnRenamed("id", "id_b").withColumnRenamed("__v", "vb"), "id_b")
    )

    def jac(pdf: pd.DataFrame) -> pd.DataFrame:
        out = np.empty(len(pdf))
        for i, (va, vb) in enumerate(zip(pdf["va"], pdf["vb"])):
            if tokens:
                sa = _token_shingle_hashes(np.asarray(va, dtype=np.int64), shingle_w, seed)
                sb = _token_shingle_hashes(np.asarray(vb, dtype=np.int64), shingle_w, seed)
            else:
                sa = _word_shingle_hashes(va or "", shingle_w, seed)
                sb = _word_shingle_hashes(vb or "", shingle_w, seed)
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            out[i] = inter / max(sa.size + sb.size - inter, 1)
        return pdf[["id_a", "id_b"]].assign(jaccard=out)

    return joined.mapInPandas(
        lambda it: (jac(pdf) for pdf in it), "id_a long, id_b long, jaccard double"
    )


def minhash_near_duplicates(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_perm: int = 64,
    shingle_w: int = 3,
    bands: int = 16,
    rows_per_band: int = 4,
    seed: int = 1,
    tokens: bool = False,
) -> DataFrame:
    """End-to-end: DataFrame[id_a, id_b, jaccard] with
    jaccard >= threshold."""
    sigs = minhash_signatures(
        df, col, id_col, num_perm=num_perm, shingle_w=shingle_w, seed=seed,
        tokens=tokens,
    )
    cands = lsh_candidate_pairs(sigs, bands=bands, rows_per_band=rows_per_band)
    verified = exact_jaccard_pairs(
        cands, df, col, id_col, shingle_w=shingle_w, seed=seed, tokens=tokens
    )
    return verified.filter(F.col("jaccard") >= threshold)
