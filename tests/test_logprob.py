"""Unigram LM scoring (sketchlib/text/logprob.py).

Closed-form Laplace values on tiny corpora, external-model OOV,
broadcast-kernel vs explode+join plan equality, tokens-mode vs
text-mode equivalence on rendered strings, and the dense-id guard.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sketchlib.text.logprob import (
    MAX_TOKEN_ID,
    unigram_counts,
    unigram_logprob,
)


def _scores(df, id_col="doc_id"):
    return {
        r[id_col]: (r["n_terms"], r["avg_logprob"]) for r in df.collect()
    }


def test_self_model_closed_form(spark):
    df = spark.createDataFrame(
        [("d1", "a a b"), ("d2", "c")], ["doc_id", "text"]
    )
    # counts a:2 b:1 c:1 -> N=4 V=3 denom=8
    out = _scores(unigram_logprob(df, "text"))
    lp_a, lp_b = math.log(3 / 8), math.log(2 / 8)
    assert out["d1"][0] == 3
    assert out["d1"][1] == pytest.approx((2 * lp_a + lp_b) / 3, abs=1e-12)
    assert out["d2"] == (1, pytest.approx(math.log(2 / 8), abs=1e-12))


def test_external_model_oov(spark):
    model = spark.createDataFrame([("m", "a a b c")], ["doc_id", "text"])
    target = spark.createDataFrame([("t", "a d")], ["doc_id", "text"])
    counts = unigram_counts(model, "text")
    out = _scores(unigram_logprob(target, "text", model_counts=counts))
    # N=4 V=3 denom=8; a -> ln(3/8), d unseen -> ln(1/8)
    assert out["t"][1] == pytest.approx(
        (math.log(3 / 8) + math.log(1 / 8)) / 2, abs=1e-12
    )


def test_empty_and_null_rows(spark):
    df = spark.createDataFrame(
        [("d1", "x y"), ("d2", ""), ("d3", None), ("d4", "  \t ")],
        ["doc_id", "text"],
    )
    out = _scores(unigram_logprob(df, "text"))
    assert out["d1"][0] == 2 and out["d1"][1] is not None
    for d in ("d2", "d3", "d4"):
        assert out[d] == (0, None)
    # all four input rows survive (append semantics)
    assert len(out) == 4


def test_join_plan_matches_broadcast_kernel(spark):
    rows = [
        (f"d{i}", " ".join(f"w{(i * 7 + j * 3) % 23}" for j in range(i % 9)))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fast = _scores(unigram_logprob(df, "text"))
    slow = _scores(
        unigram_logprob(df, "text", vocab_broadcast_max=1, id_col="doc_id")
    )
    assert set(fast) == set(slow)
    for k in fast:
        assert fast[k][0] == slow[k][0]
        if fast[k][1] is None:
            assert slow[k][1] is None
        else:
            assert fast[k][1] == pytest.approx(slow[k][1], abs=1e-9)


def test_join_plan_requires_id_col(spark):
    df = spark.createDataFrame([("d1", "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="id_col"):
        unigram_logprob(df, "text", vocab_broadcast_max=1)


def test_tokens_mode_matches_text_mode(spark):
    from sketchlib.spark.datagen import token_sequences

    df = token_sequences(spark, 300, seed=5).select(
        "doc_id", F.slice("tokens", 1, 32).alias("tokens")
    )
    tok = _scores(unigram_logprob(df, "tokens", tokens=True))
    txt_df = df.select(
        "doc_id",
        F.array_join(F.col("tokens").cast("array<string>"), " ").alias("text"),
    )
    txt = _scores(unigram_logprob(txt_df, "text"))
    # the two vocabularies are isomorphic (int id <-> rendered string),
    # so every count, N, V and therefore every score must agree
    assert set(tok) == set(txt)
    for k in tok:
        assert tok[k][0] == txt[k][0]
        assert tok[k][1] == pytest.approx(txt[k][1], abs=1e-9)


def test_tokens_empty_and_null(spark):
    df = spark.createDataFrame(
        [("d1", [1, 1, 2]), ("d2", []), ("d3", None)],
        "doc_id string, tokens array<int>",
    )
    out = _scores(unigram_logprob(df, "tokens", tokens=True))
    # counts 1:2 2:1 -> N=3 V=2 denom=6
    assert out["d1"] == (
        3,
        pytest.approx((2 * math.log(3 / 6) + math.log(2 / 6)) / 3, abs=1e-12),
    )
    assert out["d2"] == (0, None)
    assert out["d3"] == (0, None)


def test_tokens_dense_guard(spark):
    df = spark.createDataFrame(
        [("d1", [1, MAX_TOKEN_ID + 10])], "doc_id string, tokens array<int>"
    )
    with pytest.raises(Exception, match="token ids"):
        unigram_counts(df, "tokens", tokens=True).collect()


def test_counts_tokens_match_explode(spark):
    from sketchlib.spark.datagen import token_sequences

    df = token_sequences(spark, 200, seed=9).select(
        "doc_id", F.slice("tokens", 1, 16).alias("tokens")
    )
    fast = {
        r["term"]: r["n"]
        for r in unigram_counts(df, "tokens", tokens=True).collect()
    }
    exact = {
        r["t"]: r["n"]
        for r in df.select(F.explode("tokens").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert fast == exact


def test_tokens_null_elements_ignored(spark):
    """NULL elements inside a token array are ignored (matching the
    unigram_counts drop_null) in BOTH n_terms and the score — and do
    not crash the dense-lookup kernel."""
    df = spark.createDataFrame(
        [("d1", [1, None, 1]), ("d2", [2])],
        "doc_id string, tokens array<int>",
    )
    # counts 1:2, 2:1 -> N=3 V=2 denom=6
    out = _scores(unigram_logprob(df, "tokens", tokens=True))
    assert out["d1"] == (2, pytest.approx(math.log(3 / 6), abs=1e-12))
    assert out["d2"] == (1, pytest.approx(math.log(2 / 6), abs=1e-12))


def test_oracle_whitespace_class_matches_duckdb(spark):
    """\\x0b sits in Java's \\s but NOT in RE2's \\s — the oracle SQL
    pins the explicit class; cross-check the three tokenizers on a
    vertical-tab document end-to-end against DuckDB."""
    import duckdb

    from sketchlib.text.logprob import logprob_oracle_sql

    rows = [(1, "a\x0bb a"), (2, "a b")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_terms"], round(r["avg_logprob"], 4))
        for r in unigram_logprob(df, "text").collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (doc_id INT, text VARCHAR); "
        "INSERT INTO t VALUES (1, 'a' || chr(11) || 'b a'), (2, 'a b')"
    )
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(logprob_oracle_sql("t")).fetchall()
    }
    assert got == want
