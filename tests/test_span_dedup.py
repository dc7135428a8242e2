"""Exact duplicate-passage removal: python-recompute oracle on seeded
corpora with injected shared passages, edge cases, plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.dedup.spans import remove_duplicate_spans

WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "fox", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
]
BOILER = "terms of service apply to all visitors of this site"


def _mk_docs(n=40, seed=9):
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(n):
        words = list(rng.choice(WORDS, size=int(rng.integers(15, 30))))
        if i % 4 == 0:  # shared boilerplate passage mid-document
            k = int(rng.integers(0, len(words)))
            words[k:k] = BOILER.split(" ")
        docs.append((i, " ".join(words)))
    docs.append((100, docs[3][1]))  # exact full copy: both scrubbed
    docs.append((101, "tiny doc"))  # shorter than w: verbatim
    docs.append((102, " ".join(["loop", "the"] * 8)))  # self-repeating
    return docs


def _py_clean(docs, w, min_count=2):
    occ = {}
    grams = {}
    for i, t in docs:
        ws = t.split(" ")
        grams[i] = [tuple(ws[p : p + w]) for p in range(len(ws) - w + 1)]
        for g in grams[i]:
            occ[g] = occ.get(g, 0) + 1
    out = {}
    for i, t in docs:
        ws = t.split(" ")
        cov = set()
        for p, g in enumerate(grams[i]):
            if occ[g] >= min_count:
                cov.update(range(p, p + w))
        kept = [x for p, x in enumerate(ws) if p not in cov]
        out[i] = (" ".join(kept), len(ws) - len(kept))
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(_mk_docs(), "doc_id long, text string")


@pytest.mark.parametrize("hash_grams", [False, True])
def test_matches_python_oracle(spark, docs_df, hash_grams):
    got = {
        r["doc_id"]: (r["text"], r["n_removed"])
        for r in remove_duplicate_spans(
            # the hashed side also exercises the no-persist path
            docs_df, w=5, hash_grams=hash_grams, cache=not hash_grams
        ).collect()
    }
    want = _py_clean(_mk_docs(), 5)
    assert got == want
    # the injected structure behaved as designed
    assert got[3] == ("", len(_mk_docs()[3][1].split(" ")))  # full copy
    assert got[100][0] == ""
    assert got[101] == ("tiny doc", 0)  # sub-w doc verbatim
    assert got[102][0] == ""  # within-doc repetition scrubbed
    for i, t in _mk_docs():
        if i % 4 == 0 and i != 100:
            assert "terms of service" not in got[i][0]  # boilerplate gone


def test_min_count_threshold(spark, docs_df):
    # min_count=3: the pair-duplicated full copy (2 occurrences of its
    # grams) survives; only >=3-occurrence spans go
    got = {
        r["doc_id"]: (r["text"], r["n_removed"])
        for r in remove_duplicate_spans(docs_df, w=5, min_count=3).collect()
    }
    assert got == _py_clean(_mk_docs(), 5, min_count=3)
    assert got[3][0] != ""


def test_null_handling(spark):
    df = spark.createDataFrame(
        [(1, None), (None, "x y z q r x y z q r"), (2, "a b c d e")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["text"], r["n_removed"])
           for r in remove_duplicate_spans(df, w=5).collect()}
    # NULL id dropped; NULL text -> ''; unique doc untouched
    assert got == {1: ("", 0), 2: ("a b c d e", 0)}


def test_validation(spark, docs_df):
    with pytest.raises(ValueError, match="width"):
        remove_duplicate_spans(docs_df, w=0)
    with pytest.raises(ValueError, match="min_count"):
        remove_duplicate_spans(docs_df, min_count=1)


def test_no_python_nodes(spark, docs_df):
    plan = (
        remove_duplicate_spans(docs_df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "ArrowEval" not in plan


def test_token_mode_matches_text_mode(spark):
    """tokens=True over int arrays must produce exactly the arrays
    whose space-joined rendering the text mode produces — randomized
    corpora with planted duplicated spans, repeats-within-one-doc,
    short docs, empty and NULL rows."""
    import random

    rng = random.Random(0x5EED)
    docs = []
    boiler = [rng.randrange(50) for _ in range(7)]
    for i in range(60):
        toks = [rng.randrange(50) for _ in range(rng.randint(0, 20))]
        if i % 3 == 0:
            pos = rng.randint(0, len(toks))
            toks = toks[:pos] + boiler + toks[pos:]
        if i % 7 == 0:
            toks = toks + toks[:6]  # within-doc repeat fodder
        docs.append((i, toks))
    docs.append((1000, None))  # NULL array row
    tok_df = spark.createDataFrame(docs, "doc_id long, tokens array<int>")
    txt_df = spark.createDataFrame(
        [(i, " ".join(map(str, t)) if t else "" if t is not None else None)
         for i, t in docs],
        "doc_id long, text string",
    )
    for w in (3, 5):
        got_tok = {
            r["doc_id"]: (list(r["tokens"]), r["n_removed"])
            for r in remove_duplicate_spans(
                tok_df, col="tokens", w=w, tokens=True
            ).collect()
        }
        got_txt = {
            r["doc_id"]: (r["text"], r["n_removed"])
            for r in remove_duplicate_spans(txt_df, col="text", w=w).collect()
        }
        assert set(got_tok) == set(got_txt)
        # empty/NULL rows need no carve-out for w >= 2: text mode's ''
        # splits to one gram-less pseudo-word and outputs ('', 0),
        # which equals the rendered token-mode ([], 0)
        for d, (toks, nrem) in got_tok.items():
            txt, nrem_t = got_txt[d]
            assert " ".join(map(str, toks)) == txt, (w, d)
            assert nrem == nrem_t, (w, d)


def test_token_mode_hash_grams_identical(spark):
    rows = [
        (1, [1, 2, 3, 4, 5, 9, 9]),
        (2, [7, 1, 2, 3, 4, 5, 8]),
        (3, [6, 6, 6]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    plain = {
        r["doc_id"]: list(r["tokens"])
        for r in remove_duplicate_spans(
            df, col="tokens", w=5, tokens=True
        ).collect()
    }
    hashed = {
        r["doc_id"]: list(r["tokens"])
        for r in remove_duplicate_spans(
            df, col="tokens", w=5, tokens=True, hash_grams=True
        ).collect()
    }
    assert plain == hashed
    # the shared [1,2,3,4,5] span is scrubbed from both docs
    assert plain[1] == [9, 9] and plain[2] == [7, 8]
    assert plain[3] == [6, 6, 6]
