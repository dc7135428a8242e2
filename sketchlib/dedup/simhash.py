"""SimHash near-duplicate detection.

Per document: hash each whitespace word (or token id) to 64 bits; the
signature bit k is the sign of sum over words of (+1 if bit k set else
-1).  Near-duplicates have small Hamming distance between signatures.
Candidate generation partitions the 64 bits into 4 16-bit bands
(pigeonhole: any pair within Hamming distance 3 shares at least one
exact band); verification computes the exact Hamming distance.

Vectorization: per batch, all word hashes concatenate into one flat
uint64 array; ``np.unpackbits`` over the byte view gives the (words,
64) bit matrix and per-document ``np.add.reduceat`` sums it — no
per-row Python in the signature hot path.
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


def _sim_signature_batch(hash_lists: list[np.ndarray]) -> np.ndarray:
    """(n_docs,) int64 simhash signatures from per-doc uint64 hashes."""
    lens = np.array([max(len(h), 1) for h in hash_lists])
    flat = np.concatenate(
        [h if len(h) else np.zeros(1, dtype=np.uint64) for h in hash_lists]
    )
    bits = np.unpackbits(flat.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    starts = np.cumsum(lens) - lens
    sums = np.add.reduceat(bits.astype(np.int32), starts, axis=0)  # (docs, 64)
    sig_bits = (2 * sums > lens[:, None]).astype(np.uint8)
    packed = np.packbits(sig_bits, axis=1, bitorder="little")
    return packed.view(np.uint64).ravel().view(np.int64)


def simhash_signatures(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    seed: int = 1,
    tokens: bool = False,
) -> DataFrame:
    """DataFrame[id, sim long]."""

    if tokens:

        @pandas_udf("long")
        def sig_udf(vals: pd.Series) -> pd.Series:
            hs = [
                splitmix64(
                    np.asarray(v, dtype=np.int64).view(np.uint64)
                    ^ _U64(seed & 0xFFFFFFFFFFFFFFFF)
                )
                for v in vals
            ]
            return pd.Series(_sim_signature_batch(hs))

    else:

        @pandas_udf("long")
        def sig_udf(vals: pd.Series) -> pd.Series:
            hs = [hash_str((v or "").split(), seed=seed) for v in vals]
            return pd.Series(_sim_signature_batch(hs))

    return df.select(F.col(id_col).alias("id"), sig_udf(F.col(col)).alias("sim"))


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (np.asarray(a).view(np.uint64) ^ np.asarray(b).view(np.uint64))
    bits = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1)
    return bits.sum(axis=1)


def simhash_near_duplicates(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    seed: int = 1,
    tokens: bool = False,
    max_bucket: int = 64,
) -> DataFrame:
    """DataFrame[id_a, id_b, hamming] for pairs within max_hamming.

    4x16-bit banding guarantees recall for max_hamming <= 3."""
    sigs = simhash_signatures(df, col, id_col, seed=seed, tokens=tokens)
    bands = F.array(
        *[
            F.shiftrightunsigned(F.col("sim"), b * 16).bitwiseAND(F.lit(0xFFFF))
            for b in range(4)
        ]
    )
    exploded = sigs.select("id", "sim", F.posexplode(bands).alias("band", "bh"))

    def emit_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = list(pdf[["id", "sim"]].head(max_bucket).itertuples(index=False))
        rows.sort()
        pairs = [
            (a_id, b_id, a_s, b_s)
            for (a_id, a_s), (b_id, b_s) in itertools.combinations(rows, 2)
        ]
        if not pairs:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
                 "sim_a": pd.Series(dtype="int64"), "sim_b": pd.Series(dtype="int64")}
            )
        a, b, sa, sb = zip(*pairs)
        return pd.DataFrame({"id_a": a, "id_b": b, "sim_a": sa, "sim_b": sb})

    cands = (
        exploded.groupBy("band", "bh")
        .applyInPandas(emit_pairs, "id_a long, id_b long, sim_a long, sim_b long")
        .distinct()
    )

    def verify(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
                 "hamming": pd.Series(dtype="int32")}
            )
        hd = hamming64(pdf["sim_a"].to_numpy(), pdf["sim_b"].to_numpy())
        out = pdf[["id_a", "id_b"]].assign(hamming=hd.astype(np.int32))
        return out[out["hamming"] <= max_hamming]

    return cands.mapInPandas(
        lambda it: (verify(pdf) for pdf in it),
        "id_a long, id_b long, hamming int",
    )
