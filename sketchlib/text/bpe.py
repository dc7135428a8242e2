"""Byte-pair-encoding tokenization for training pipelines: train a
merge table from corpus word frequencies, encode documents into
subword pieces, decode back exactly.

Spark-first split of work: the only distributed pass is a word-count
aggregate (explode + groupBy, map-side partial agg — tiny result);
the merge-training loop is driver-side python over that frequency
dict (BPE training is inherently sequential in the merge order, and
the loop is INCREMENTAL — each merge touches only the words that
contain the merged pair, via a pair->words index, not the whole
vocabulary), and encoding is a vectorized pandas kernel with the
merge ranks broadcast in the task closure plus a size-capped per-task
word cache (real corpora repeat words heavily, so each distinct word
is merged once per task).

Determinism: merges are picked by (count DESC, pair ASC) — a total
order, so the same corpus and parameters always yield the same merge
table on any engine.  Word boundaries are Java ``\\s`` (ASCII
whitespace) on BOTH the Spark training split and the Python encode
kernel, so the two passes always agree.  Decoding is exact by
construction (BPE only SEGMENTS words; the end-of-word marker
restores boundaries), which is the gate invariant:
decode(encode(x)) == normalize-whitespace(x).  A word containing the
literal marker would corrupt that inverse, so train/encode REJECT it
loudly — pass a marker that cannot occur in your corpus (e.g.
``eow="\\x1f"``) for markup-bearing text."""

from __future__ import annotations

import heapq
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default end-of-word marker appended to each word's final symbol
#: (GPT-style </w>): makes word boundaries recoverable from the
#: token stream
EOW = "</w>"

#: Java \s (the split used on the Spark side) is ASCII-only; Python's
#: str.split()/\s also match U+00A0 etc. — this explicit class keeps
#: the two engines' word boundaries identical
_ASCII_WS = re.compile(r"[ \t\n\r\f\v]+")


def _word_symbols(word: str, eow: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + eow,)


def _check_marker(word: str, eow: str) -> None:
    if eow in word:
        raise ValueError(
            f"word {word!r} contains the end-of-word marker {eow!r}; "
            "decode would corrupt it — pass an eow that cannot occur "
            "in the corpus (e.g. '\\x1f')"
        )


def train_bpe(
    df: DataFrame,
    col: str = "text",
    num_merges: int = 256,
    max_words: int = 65536,
    eow: str = EOW,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the whitespace words of a
    text column.  One distributed word-count aggregate (the result is
    at most the corpus vocabulary, capped at the ``max_words`` most
    frequent words — TakeOrderedAndProject, no full sort); the greedy
    merge loop runs driver-side with an incremental pair->words index
    (each merge rewrites only the words containing the merged pair).
    Ties broken by (count DESC, pair ASC): fully deterministic."""
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    if not eow:
        raise ValueError("eow must be non-empty")
    rows = (
        df.select(F.explode(F.split(F.col(col), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        # +1 sentinel row: detect (and warn about) cap truncation
        # without a second count job
        .limit(max_words + 1)
        .collect()
    )
    if len(rows) > max_words:
        import warnings

        warnings.warn(
            f"train_bpe: corpus vocabulary exceeds max_words="
            f"{max_words}; training on the {max_words} most frequent "
            "words only (rarest tail dropped). Raise max_words if the "
            "tail matters — driver memory/time grow with it.",
            UserWarning,
            stacklevel=2,
        )
        rows = rows[:max_words]
    words: list[list[str]] = []
    freqs: list[int] = []
    for r in rows:
        _check_marker(r["w"], eow)
        words.append(list(_word_symbols(r["w"], eow)))
        freqs.append(int(r["n"]))

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, syms in enumerate(words):
        n = freqs[wi]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + n
            pair_words.setdefault(p, set()).add(wi)

    # lazy max-heap over (-count, pair): every count CHANGE pushes a
    # fresh entry; pop discards entries whose count no longer matches
    # pair_counts (stale).  Same total order as a full min() scan —
    # (count DESC, pair ASC) — but amortized O(log P) per merge
    # instead of O(P), which is the difference between minutes and
    # hours at a 32k-merge / 64k-word realistic vocabulary.
    heap: list[tuple[int, tuple[str, str]]] = [
        (-c, p) for p, c in pair_counts.items()
    ]
    heapq.heapify(heap)

    def _bump(p: tuple[str, str], n: int, wi: int) -> None:
        c = pair_counts.get(p, 0) + n
        if c:
            pair_counts[p] = c
            heapq.heappush(heap, (-c, p))
        else:
            pair_counts.pop(p, None)
        if n > 0:
            pair_words.setdefault(p, set()).add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        while heap:
            negc, p = heapq.heappop(heap)
            if pair_counts.get(p) == -negc:
                best = p
                break
        if best is None:
            break
        merges.append(best)
        merged = best[0] + best[1]
        # rewrite ONLY the words containing the pair, adjusting the
        # neighbouring pair counts as we go (subword-nmt-style)
        for wi in sorted(pair_words.pop(best, ())):
            syms, n = words[wi], freqs[wi]
            i = 0
            while i < len(syms) - 1:
                if syms[i] == best[0] and syms[i + 1] == best[1]:
                    if i > 0:
                        _bump((syms[i - 1], syms[i]), -n, wi)
                        _bump((syms[i - 1], merged), n, wi)
                    if i + 2 < len(syms):
                        _bump((syms[i + 1], syms[i + 2]), -n, wi)
                        _bump((merged, syms[i + 2]), n, wi)
                    syms[i : i + 2] = [merged]
                else:
                    i += 1
        pair_counts.pop(best, None)
    return merges


def _encode_word(
    word: str, ranks: dict[tuple[str, str], int], eow: str = EOW
) -> list[str]:
    syms = list(_word_symbols(word, eow))
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


#: per-task encode cache cap: bounds executor memory on corpora with
#: unbounded distinct-word tails (urls, ids, typos) while still
#: collapsing the heavy head
_CACHE_CAP = 1 << 16


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    col: str = "text",
    out_col: str = "bpe_tokens",
    eow: str = EOW,
) -> DataFrame:
    """Append an ``array<string>`` column of BPE pieces.  Merges apply
    in rank order (lowest-rank pair first), exactly reversing the
    training loop, so encode/train agree on segmentation.  One
    Arrow-batched pandas kernel on the scan — no shuffle; the merge
    table rides the task closure (KBs), and a size-capped per-task
    word cache collapses repeated words to one merge run.  A word
    containing the ``eow`` marker fails the task loudly (decode would
    silently corrupt it otherwise)."""
    if out_col in df.columns:
        raise ValueError(f"output column {out_col!r} already exists")
    if not eow:
        raise ValueError("eow must be non-empty")
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}

        def enc(text) -> list[str]:
            if text is None:
                return []
            toks: list[str] = []
            for w in _ASCII_WS.split(text):
                if not w:
                    continue
                got = cache.get(w)
                if got is None:
                    _check_marker(w, eow)
                    got = _encode_word(w, ranks, eow)
                    if len(cache) < _CACHE_CAP:
                        cache[w] = got
                toks.extend(got)
            return toks

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pdf[col].map(enc)
            yield pdf

    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.mapInPandas(kernel, f"{schema}, `{out_col}` array<string>")


def bpe_decode_column(col, eow: str = EOW):
    """Catalyst expression reconstructing the normalized text from a
    BPE piece array: concatenate pieces, turn each end-of-word marker
    back into a single space, trim the trailing one.  Exact inverse of
    ``bpe_encode`` up to whitespace normalization (runs of ASCII
    whitespace become one space) — pure Catalyst, usable in any
    downstream expression.  Exactness relies on the corpus never
    containing the marker, which train/encode enforce loudly."""
    return F.trim(F.replace(F.array_join(col, ""), F.lit(eow), F.lit(" ")))
