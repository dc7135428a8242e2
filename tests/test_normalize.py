"""normalize_text / split_passages (sketchlib/text/normalize.py)."""

import pytest
from pyspark.sql import functions as F

from sketchlib.text.normalize import normalize_text, split_passages


def test_normalize_full_recipe(spark):
    rows = [
        (0, "  Hello\t WORLD  "),
        (1, "Café  X"),  # decomposed é
        (2, "already clean"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"] for r in normalize_text(df).collect()
    }
    assert got[0] == "hello world"
    assert got[1] == "café x"  # composed é, collapsed, lowered
    assert got[2] == "already clean"
    assert got[3] == ""


def test_normalize_idempotent_and_flags(spark):
    df = spark.createDataFrame(
        [(0, "  Á   b  ")], "doc_id long, text string"
    )
    once = normalize_text(df)
    twice = normalize_text(once)
    assert once.collect() == twice.collect()
    # out_col keeps the original; collisions raise
    kept = normalize_text(df, out_col="norm").collect()[0]
    assert kept["text"] == "  Á   b  " and kept["norm"] == "á b"
    with pytest.raises(ValueError, match="already exists"):
        normalize_text(df, out_col="text")
    # catalyst-only path (no NFC): still lowers/collapses/trims
    plain = normalize_text(df, nfc=False).collect()[0]["text"]
    assert plain == "á b"


def test_split_passages_basic(spark):
    rows = [
        (0, "aa\n\nbb\n\ncc", "en"),
        (1, "solo", "de"),
        (2, "x\n\n\n\ny", "fr"),  # consecutive seps -> empty slot
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = split_passages(df).collect()
    got = sorted((r["doc_id"], r["passage_idx"], r["passage"], r["lang"]) for r in out)
    # doc 2: 'x', '', 'y' -> empty dropped, indexes keep their slots
    assert got == [
        (0, 1, "aa", "en"),
        (0, 2, "bb", "en"),
        (0, 3, "cc", "en"),
        (1, 1, "solo", "de"),
        (2, 1, "x", "fr"),
        (2, 3, "y", "fr"),
    ]
    kept = split_passages(df, keep_empty=True).collect()
    assert len(kept) == 7


def test_split_passages_literal_sep_not_regex(spark):
    df = spark.createDataFrame([(0, "a.b.c|d")], "doc_id long, text string")
    got = [
        r["passage"]
        for r in split_passages(df, sep=".").orderBy("passage_idx").collect()
    ]
    assert got == ["a", "b", "c|d"]  # '.' split literally, not as regex


def test_split_passages_validation(spark):
    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        split_passages(df, sep="")
    with pytest.raises(ValueError, match="already exists"):
        split_passages(df.withColumn("passage", F.lit("x")))
