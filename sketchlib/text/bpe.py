"""Byte-pair-encoding tokenization for training pipelines: train a
merge table from corpus word frequencies, encode documents into
subword ids, decode back exactly.

Spark-first split of work: the only distributed pass is a word-count
aggregate (explode + groupBy, map-side partial agg — tiny result);
the merge-training loop is driver-side python over that frequency
dict (BPE training is inherently sequential in the merge order), and
encoding is a vectorized pandas kernel with the merge ranks broadcast
in the task closure plus a per-batch word cache (real corpora repeat
words heavily, so each distinct word is merged once per batch).

Determinism: merges are picked by (count DESC, pair ASC) — a total
order, so the same corpus and parameters always yield the same merge
table on any engine.  Decoding is exact by construction (BPE only
SEGMENTS words; the end-of-word marker restores boundaries), which is
the gate invariant: decode(encode(x)) == normalize-whitespace(x)."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: end-of-word marker appended to each word's final symbol (GPT-style
#: </w>): makes word boundaries recoverable from the token stream
EOW = "</w>"


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + EOW,)


def train_bpe(
    df: DataFrame,
    col: str = "text",
    num_merges: int = 256,
    max_words: int = 65536,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the whitespace words of a
    text column.  One distributed word-count aggregate (the result is
    at most the corpus vocabulary, capped at the ``max_words`` most
    frequent words — TakeOrderedAndProject, no full sort); the greedy
    merge loop runs driver-side on that dict.  Ties broken by
    (count DESC, pair ASC): fully deterministic."""
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    rows = (
        df.select(F.explode(F.split(F.col(col), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(max_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        _word_symbols(r["w"]): int(r["n"]) for r in rows
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        out: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            i, new = 0, []
            while i < len(syms):
                if (
                    i < len(syms) - 1
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    new.append(merged)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            key = tuple(new)
            out[key] = out.get(key, 0) + n
        vocab = out
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append an ``array<string>`` column of BPE pieces.  Merges apply
    in rank order (lowest-rank pair first), exactly reversing the
    training loop, so encode/train agree on segmentation.  One
    Arrow-batched pandas kernel on the scan — no shuffle; the merge
    table rides the task closure (KBs), and a per-batch word cache
    collapses repeated words to one merge run."""
    if out_col in df.columns:
        raise ValueError(f"output column {out_col!r} already exists")
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}

        def enc(text) -> list[str]:
            if text is None:
                return []
            toks: list[str] = []
            for w in text.split():
                got = cache.get(w)
                if got is None:
                    got = _encode_word(w, ranks)
                    cache[w] = got
                toks.extend(got)
            return toks

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pdf[col].map(enc)
            yield pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.mapInPandas(kernel, f"{schema}, {out_col} array<string>")


def bpe_decode_column(col):
    """Catalyst expression reconstructing the normalized text from a
    BPE piece array: concatenate pieces, turn each end-of-word marker
    back into a single space, trim the trailing one.  Exact inverse of
    ``bpe_encode`` up to whitespace normalization (runs of whitespace
    become one space) — pure Catalyst, usable in any downstream
    expression."""
    return F.trim(F.replace(F.array_join(col, ""), F.lit(EOW), F.lit(" ")))
