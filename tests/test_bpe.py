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


def _naive_train(words_freqs, num_merges):
    """Reference trainer: full min() scan per merge — the spec the
    heap-based loop must match exactly (count DESC, pair ASC)."""
    words = [list(w) for w, _ in words_freqs]
    freqs = [n for _, n in words_freqs]
    merges = []
    for _ in range(num_merges):
        counts = {}
        for syms, n in zip(words, freqs):
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        for syms in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == best[0] and syms[i + 1] == best[1]:
                    syms[i : i + 2] = [merged]
                else:
                    i += 1
    return merges


def test_heap_trainer_matches_naive_reference(spark):
    """The lazy-heap best-pair selection must reproduce the naive
    full-scan trainer's merge sequence exactly (same total order,
    ties included) on a randomized corpus."""
    import random

    from sketchlib.text.bpe import train_bpe

    rng = random.Random(0xBEEF)
    vocab = ["".join(rng.choices("abcd", k=rng.randint(1, 6))) for _ in range(120)]
    docs = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(1, 12))))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = train_bpe(df, num_merges=64, max_words=1024)

    # rebuild the trainer's exact word/freq input (same split, same eow)
    from collections import Counter

    cnt = Counter(w for _, t in docs for w in t.split())
    wf = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    words_freqs = [
        (tuple(w[:-1]) + (w[-1] + "</w>",), n) for w, n in wf
    ]
    want = _naive_train(words_freqs, 64)
    assert got == want


def test_train_bpe_warns_on_vocab_truncation(spark):
    """Regression: the max_words cap silently dropped the vocabulary
    tail; the trainer must warn when truncation actually happens and
    stay silent when the vocab fits."""
    import warnings

    from sketchlib.text.bpe import train_bpe

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i + 1} shared") for i in range(40)],
        "doc_id long, text string",
    )
    with pytest.warns(UserWarning, match="max_words"):
        train_bpe(docs, num_merges=4, max_words=8)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        train_bpe(docs, num_merges=4, max_words=10_000)
