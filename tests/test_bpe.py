"""BPE tokenization (sketchlib/text/bpe.py): deterministic training,
encode/train agreement, exact roundtrip decode."""

import pytest
from pyspark.sql import functions as F

from sketchlib.text.bpe import (
    EOW,
    _encode_word,
    bpe_decode_column,
    bpe_encode,
    train_bpe,
)


@pytest.fixture(scope="module")
def corpus_df(spark):
    rows = [
        (0, "low low low low low"),
        (1, "lower lower newest newest newest newest"),
        (2, "newest newest widest widest widest"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_bpe_classic_corpus(spark, corpus_df):
    """The textbook Sennrich corpus: the first merges must fuse the
    most frequent adjacent pairs ('es' from newest x6 leads)."""
    merges = train_bpe(corpus_df, num_merges=4)
    assert merges[0] == ("e", "s")  # 6x in 'newest'
    assert merges[1] == ("es", "t" + EOW)
    # deterministic: retraining yields the identical table
    assert merges == train_bpe(corpus_df, num_merges=4)


def test_encode_matches_training_segmentation(spark, corpus_df):
    merges = train_bpe(corpus_df, num_merges=8)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    # after 8 merges on this corpus 'newest' is heavily fused
    toks = _encode_word("newest", ranks)
    assert "".join(toks) == "newest" + EOW
    assert len(toks) < len("newest") + 1  # actually compressed


def test_encode_decode_roundtrip_exact(spark, corpus_df):
    merges = train_bpe(corpus_df, num_merges=8)
    enc = bpe_encode(corpus_df, merges)
    out = enc.withColumn(
        "back", bpe_decode_column(F.col("bpe_tokens"))
    ).collect()
    for r in out:
        assert r["back"] == " ".join(r["text"].split())
        for t in r["bpe_tokens"]:
            assert t  # no empty pieces


def test_roundtrip_on_unseen_words(spark, corpus_df):
    """Words never seen in training still encode (char fallback) and
    roundtrip exactly."""
    merges = train_bpe(corpus_df, num_merges=8)
    df = spark.createDataFrame(
        [(0, "zzz qqq  low"), (1, ""), (2, None)],
        "doc_id long, text string",
    )
    out = bpe_encode(df, merges).withColumn(
        "back", bpe_decode_column(F.col("bpe_tokens"))
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["back"] == "zzz qqq low"
    assert by_id[1]["bpe_tokens"] == [] and by_id[1]["back"] == ""
    assert by_id[2]["bpe_tokens"] == [] and by_id[2]["back"] == ""


def test_validation(spark, corpus_df):
    with pytest.raises(ValueError, match="num_merges"):
        train_bpe(corpus_df, num_merges=0)
    with pytest.raises(ValueError, match="already exists"):
        bpe_encode(corpus_df.withColumn("bpe_tokens", F.lit("x")), [])


def test_marker_collision_rejected(spark):
    """A word containing the literal end-of-word marker would decode
    corrupted — train and encode must refuse loudly, and a custom
    marker must sidestep it entirely."""
    df = spark.createDataFrame(
        [(0, "a</w>b plain")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="end-of-word marker"):
        train_bpe(df, num_merges=1)
    clean = spark.createDataFrame([(0, "aa ab")], "doc_id long, text string")
    merges = train_bpe(clean, num_merges=2)
    with pytest.raises(Exception, match="end-of-word marker"):
        bpe_encode(df, merges).collect()  # kernel raises at runtime
    # custom marker: the same corpus trains, encodes, and roundtrips
    m2 = train_bpe(df, num_merges=2, eow="\x1f")
    out = bpe_encode(df, m2, eow="\x1f").withColumn(
        "back", bpe_decode_column(F.col("bpe_tokens"), eow="\x1f")
    ).collect()[0]
    assert out["back"] == "a</w>b plain"


def test_ascii_whitespace_word_boundaries(spark):
    """Word boundaries are Java-\\s (ASCII): U+00A0 stays INSIDE a
    word on both the training split and the encode kernel, so
    roundtrip still holds."""
    df = spark.createDataFrame(
        [(0, "a b a b cc")], "doc_id long, text string"
    )
    merges = train_bpe(df, num_merges=4)
    out = bpe_encode(df, merges).withColumn(
        "back", bpe_decode_column(F.col("bpe_tokens"))
    ).collect()[0]
    assert out["back"] == "a b a b cc"


def test_incremental_trainer_matches_overlaps(spark):
    """'aaaa' exercises overlapping-pair bookkeeping in the
    incremental pair index (merge (a,a) twice within one word)."""
    df = spark.createDataFrame(
        [(0, "aaaa aaaa aa")], "doc_id long, text string"
    )
    merges = train_bpe(df, num_merges=3)
    assert merges[0] == ("a", "a")
    enc = bpe_encode(df, merges).withColumn(
        "back", bpe_decode_column(F.col("bpe_tokens"))
    ).collect()[0]
    assert enc["back"] == "aaaa aaaa aa"


def test_encode_quoted_column_names(spark, corpus_df):
    merges = train_bpe(corpus_df, num_merges=4)
    odd = corpus_df.withColumnRenamed("text", "my text")
    out = bpe_encode(odd, merges, col="my text").collect()
    assert all(len(r["bpe_tokens"]) > 0 for r in out)
