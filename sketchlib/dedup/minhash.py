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

Two input modes: ``text`` (whitespace words; ALL words of an Arrow
batch hashed in one vectorized C-level call) and pre-tokenized
``array<int>`` columns (fully vectorized splitmix64 — the
10^12-token-scale path; tokenize once, dedup many times).
"""

from __future__ import annotations


import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from sketchlib.core.hashing import hash_str, splitmix64

_U64 = np.uint64


def _roll_shingles(wh: np.ndarray, w: int) -> np.ndarray:
    """Unique rolling w-gram hashes from per-word hashes (vectorized)."""
    n = wh.size - w + 1
    acc = wh[:n].copy()
    for i in range(1, w):
        with np.errstate(over="ignore"):
            acc = splitmix64(acc ^ (wh[i : i + n] * _U64(0x9E3779B97F4A7C15)))
    return np.unique(acc)


def _word_shingle_hashes_batch(
    texts, w: int, seed: int
) -> list[np.ndarray]:
    """Per-doc unique shingle hashes for a whole Arrow batch.

    All words of every document in the batch are hashed in ONE
    vectorized ``hash_str`` call (the former per-doc/per-word loop
    dominated the dedup_minhash query); only the cheap rolling combine
    runs per document."""
    docs = [(t or "").split() for t in texts]
    flat: list[str] = []
    spans: list[tuple[int, int, int]] = []  # (start, n, kind) 0=empty 1=short 2=full
    for ws in docs:
        if not ws:
            spans.append((len(flat), 0, 0))
        elif len(ws) < w:
            spans.append((len(flat), 1, 1))
            flat.append(" ".join(ws))
        else:
            spans.append((len(flat), len(ws), 2))
            flat.extend(ws)
    wh_all = hash_str(flat, seed=seed)
    out: list[np.ndarray] = []
    for start, n, kind in spans:
        if kind == 0:
            out.append(np.zeros(1, dtype=np.uint64))
        elif kind == 1:
            out.append(wh_all[start : start + 1].copy())
        else:
            out.append(_roll_shingles(wh_all[start : start + n], w))
    return out


def _word_shingle_hashes(text: str, w: int, seed: int) -> np.ndarray:
    return _word_shingle_hashes_batch([text], w, seed)[0]


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
            shingles = _word_shingle_hashes_batch(vals, shingle_w, seed)
            return pd.Series(
                [
                    _minhash_from_shingles(sh, num_perm, seed).tolist()
                    for sh in shingles
                ]
            )

    return df.select(F.col(id_col).alias("id"), sig_udf(F.col(col)).alias("sig"))


def lsh_candidate_pairs(
    sig_df: DataFrame,
    bands: int = 16,
    rows_per_band: int = 4,
    max_bucket: int = 64,
    num_perm: int | None = None,
) -> DataFrame:
    """DataFrame[id_a, id_b] distinct candidate pairs from band-hash
    buckets.  Everything stays JVM-side: band hashes via ``xxhash64``
    over signature slices, bucket-membership cap via a window
    row_number (skew guard — a pathological bucket of B members would
    emit B^2/2 pairs), and pair emission via an equi-self-join on
    (band, bucket-hash) inside whole-stage codegen.  (An earlier
    applyInPandas-per-bucket version spent ~2ms of Python overhead per
    bucket — 100k buckets made candidate generation the bottleneck.)"""
    from pyspark.sql.window import Window

    if num_perm is not None and bands * rows_per_band > num_perm:
        # F.slice past the end of the signature silently yields
        # truncated/empty band slices: trailing bands would hash a
        # constant and place EVERY document in one bucket
        raise ValueError(
            f"bands*rows_per_band = {bands * rows_per_band} exceeds the "
            f"signature length num_perm = {num_perm}"
        )

    band_hashes = F.array(
        *[
            F.xxhash64(F.slice("sig", b * rows_per_band + 1, rows_per_band))
            for b in range(bands)
        ]
    )
    exploded = sig_df.select("id", F.posexplode(band_hashes).alias("band", "bh"))
    w = Window.partitionBy("band", "bh").orderBy("id")
    # persist: the self-join below reads this twice, and its upstream
    # includes the Python signature UDF — without a cache every join
    # side would recompute all signatures
    capped = (
        exploded.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_bucket)
        .select("band", "bh", "id")
        .persist()
    )
    a = capped.alias("a")
    b = capped.alias("b")
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def _shingle_sets_df(
    df: DataFrame,
    col: str,
    id_col: str,
    shingle_w: int,
    seed: int,
    tokens: bool,
) -> DataFrame:
    """DataFrame[id, sh array<long>] — each doc's sorted unique shingle
    hashes, computed once (the verifier joins these instead of
    re-hashing text per candidate pair)."""

    if tokens:

        @pandas_udf("array<long>")
        def sh_udf(vals: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    _token_shingle_hashes(
                        np.asarray(v, dtype=np.int64), shingle_w, seed
                    ).view(np.int64).tolist()
                    for v in vals
                ]
            )

    else:

        @pandas_udf("array<long>")
        def sh_udf(vals: pd.Series) -> pd.Series:
            shingles = _word_shingle_hashes_batch(vals, shingle_w, seed)
            return pd.Series([sh.view(np.int64).tolist() for sh in shingles])

    return df.select(F.col(id_col).alias("id"), sh_udf(F.col(col)).alias("sh"))


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
    DataFrame[id_a, id_b, jaccard].  Shingle sets are computed once per
    document and joined to the pairs (never re-hashed per pair)."""
    # persist: joined twice (id_a and id_b sides) and upstream is the
    # shingle-hash UDF
    sh = _shingle_sets_df(df, col, id_col, shingle_w, seed, tokens).persist()
    joined = (
        pairs.join(
            sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sha")), "id_a"
        ).join(
            sh.select(F.col("id").alias("id_b"), F.col("sh").alias("shb")), "id_b"
        )
    )

    def jac(pdf: pd.DataFrame) -> pd.DataFrame:
        out = np.empty(len(pdf))
        for i, (sa, sb) in enumerate(zip(pdf["sha"], pdf["shb"])):
            sa = np.asarray(sa, dtype=np.int64)
            sb = np.asarray(sb, dtype=np.int64)
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
    cands = lsh_candidate_pairs(
        sigs, bands=bands, rows_per_band=rows_per_band, num_perm=num_perm
    )
    verified = exact_jaccard_pairs(
        cands, df, col, id_col, shingle_w=shingle_w, seed=seed, tokens=tokens
    )
    return verified.filter(F.col("jaccard") >= threshold)
