"""Exact global ranking (with_global_rank) and Bloom-pruned joins
(bloom_filtered_join).

Rank contract: identical to row_number() OVER (ORDER BY order,
*ties) under a total order, whichever plan the adaptive gate picks
(single window vs two-phase bucketed prefix sum), for numeric AND
string order keys.  Join contract: result-identical to the plain
join — the Bloom only prunes shuffle volume, never rows."""

import pytest
from pyspark.sql import functions as F

from sketchlib.spark.api import bloom_filtered_join, with_global_rank


@pytest.fixture(scope="module")
def scored_df(spark):
    # scores collide on purpose (score = id % 97) so ties are real;
    # doc_id is the unique tie-break
    return (
        spark.range(0, 4000)
        .withColumnRenamed("id", "doc_id")
        .withColumn("score", (F.col("doc_id") * 37 % 97).cast("double"))
        .withColumn(
            "word", F.concat(F.lit("w"), (F.col("doc_id") * 13 % 53))
        )
    )


def _expected_ranks(rows, keyfn):
    srt = sorted(rows, key=keyfn)
    return {r["doc_id"]: i + 1 for i, r in enumerate(srt)}


def test_rank_matches_sorted_order_both_plans(spark, scored_df):
    rows = scored_df.collect()
    want = _expected_ranks(rows, lambda r: (r["score"], r["doc_id"]))
    for min_parts in (10**9, 0):  # single-window plan, bucketed plan
        got = {
            r["doc_id"]: r["rank"]
            for r in with_global_rank(
                scored_df,
                "score",
                tie_cols=["doc_id"],
                bucketed_min_partitions=min_parts,
                order_buckets=64,
            ).collect()
        }
        assert got == want


def test_rank_string_order_key(spark, scored_df):
    rows = scored_df.collect()
    want = _expected_ranks(rows, lambda r: (r["word"], r["doc_id"]))
    got = {
        r["doc_id"]: r["rank"]
        for r in with_global_rank(
            scored_df,
            "word",
            tie_cols=["doc_id"],
            bucketed_min_partitions=0,
            order_buckets=16,
        ).collect()
    }
    assert got == want


def test_rank_bucket_count_invariance(spark, scored_df):
    """The bucketed prefix sum is exact for ANY bucket count."""
    base = None
    for nb in (4, 64, 1024):
        got = sorted(
            (r["doc_id"], r["rank"])
            for r in with_global_rank(
                scored_df,
                "score",
                tie_cols=["doc_id"],
                bucketed_min_partitions=0,
                order_buckets=nb,
            ).collect()
        )
        if base is None:
            base = got
        else:
            assert got == base


def test_shards_are_balanced_interleaved(spark, scored_df):
    out = with_global_rank(
        scored_df,
        "score",
        tie_cols=["doc_id"],
        n_shards=8,
        bucketed_min_partitions=0,
    )
    counts = {
        r["shard"]: r["n"]
        for r in out.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) == set(range(8))
    assert max(counts.values()) - min(counts.values()) <= 1
    # striping: consecutive ranks land on consecutive shards
    sample = out.filter(F.col("rank") <= 16).collect()
    for r in sample:
        assert r["shard"] == (r["rank"] - 1) % 8


def test_rank_validation(spark, scored_df):
    with pytest.raises(ValueError, match="n_shards"):
        with_global_rank(scored_df, "score", n_shards=0)
    with pytest.raises(ValueError, match="already exists"):
        with_global_rank(scored_df, "score", rank_col="score")


def test_bloom_join_matches_plain_join(spark, scored_df):
    big = scored_df.select("doc_id", "score")
    small = (
        spark.range(0, 500)
        .select((F.col("id") * 7).alias("doc_id"))
        .withColumn("tag", F.concat(F.lit("t"), F.col("doc_id") % 5))
    )
    got = bloom_filtered_join(big, small, "doc_id").collect()
    want = big.join(small, on="doc_id", how="inner").collect()
    key = lambda r: (r["doc_id"], r["score"], r["tag"])  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)


def test_bloom_join_left_semi(spark, scored_df):
    big = scored_df.select("doc_id", "score")
    small = spark.range(0, 100).select((F.col("id") * 11).alias("doc_id"))
    got = {
        r["doc_id"]
        for r in bloom_filtered_join(big, small, "doc_id", how="left_semi")
        .select("doc_id")
        .collect()
    }
    want = {
        r["doc_id"]
        for r in big.join(small, on="doc_id", how="left_semi")
        .select("doc_id")
        .collect()
    }
    assert got == want


def test_bloom_join_rejects_outer(spark, scored_df):
    small = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="inner/left_semi"):
        bloom_filtered_join(scored_df, small, "doc_id", how="left")


def test_bloom_join_actually_prunes(spark, scored_df):
    """The pre-join filter drops (almost all) non-matching rows: with
    10 keys out of 4000 and fpr 1e-3, the pruned side must be tiny."""
    from sketchlib.spark.api import bloom_contains, build_bloom

    big = scored_df.select("doc_id")
    small = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    bloom = build_bloom(small, "doc_id", capacity=1000, fpr=1e-3)
    kept = (
        bloom_contains(big, "doc_id", bloom, out_col="m")
        .filter(F.col("m"))
        .count()
    )
    assert 10 <= kept <= 30  # FPs possible, but bounded way below 4000


def test_top_k_per_group_both_plans(spark, scored_df):
    from sketchlib.spark.api import top_k_per_group

    grp = scored_df.withColumn("g", F.col("doc_id") % 7)
    rows = grp.collect()
    want = {}
    for r in sorted(rows, key=lambda r: (-r["score"], r["doc_id"])):
        want.setdefault(r["g"], []).append(r["doc_id"])
    want = {g: ids[:5] for g, ids in want.items()}
    for min_parts in (10**9, 0):  # single-window plan, two-level plan
        out = top_k_per_group(
            grp,
            ["g"],
            5,
            order_col="score",
            descending=True,
            tie_cols=["doc_id"],
            two_level_min_partitions=min_parts,
        ).collect()
        got = {}
        for r in sorted(out, key=lambda r: (r["g"], r["rank"])):
            got.setdefault(r["g"], []).append(r["doc_id"])
        assert got == want


def test_top_k_per_group_hash_sample_stable(spark, scored_df):
    """order_col=None draws the SAME k rows per group regardless of
    layout, and never more than the group holds."""
    from sketchlib.spark.api import top_k_per_group

    grp = scored_df.withColumn("g", F.col("doc_id") % 400)  # 10 rows/group
    a = {
        (r["g"], r["doc_id"])
        for r in top_k_per_group(
            grp, ["g"], 3, two_level_min_partitions=0
        ).collect()
    }
    b = {
        (r["g"], r["doc_id"])
        for r in top_k_per_group(
            grp.repartition(23), ["g"], 3, two_level_min_partitions=0
        ).collect()
    }
    assert a == b
    per_g = {}
    for g, _ in a:
        per_g[g] = per_g.get(g, 0) + 1
    assert set(per_g.values()) == {3}


def test_top_k_per_group_validation(spark, scored_df):
    from sketchlib.spark.api import top_k_per_group

    with pytest.raises(ValueError, match="k must"):
        top_k_per_group(scored_df, ["doc_id"], 0)
    with pytest.raises(ValueError, match="group_cols"):
        top_k_per_group(scored_df, [], 1)
    with pytest.raises(ValueError, match="already exists"):
        top_k_per_group(scored_df, ["doc_id"], 1, rank_col="score")


def _ntile0(n_rows, n_tiles, r):
    q, rem = divmod(n_rows, n_tiles)
    if q == 0:
        return r - 1
    cutoff = rem * (q + 1)
    if r <= cutoff:
        return (r - 1) // (q + 1)
    return rem + (r - 1 - cutoff) // q


@pytest.mark.parametrize("n_rows,n_tiles", [(4000, 8), (4000, 7), (5, 8)])
def test_contiguous_shards_match_ntile(spark, scored_df, n_rows, n_tiles):
    df = scored_df.filter(F.col("doc_id") < n_rows)
    for min_parts in (10**9, 0):  # both plans
        out = with_global_rank(
            df,
            "score",
            tie_cols=["doc_id"],
            n_shards=n_tiles,
            shard_mode="contiguous",
            bucketed_min_partitions=min_parts,
            order_buckets=32,
        ).collect()
        for r in out:
            assert r["shard"] == _ntile0(min(n_rows, 4000), n_tiles, r["rank"])
        # independent oracle: Spark's own NTILE (so a shared bug in the
        # divmod formula above cannot self-confirm)
        from pyspark.sql.window import Window

        w = Window.orderBy("score", "doc_id")
        want = {
            r["doc_id"]: r["nt"]
            for r in df.withColumn(
                "nt", F.ntile(n_tiles).over(w) - 1
            ).collect()
        }
        assert {r["doc_id"]: r["shard"] for r in out} == want


def test_shard_mode_validation(spark, scored_df):
    with pytest.raises(ValueError, match="shard_mode"):
        with_global_rank(
            scored_df, "score", n_shards=4, shard_mode="zigzag"
        )


def test_shuffle_rows_permutation_deterministic(spark, scored_df):
    from sketchlib.spark.api import shuffle_rows

    out = shuffle_rows(
        scored_df, seed=5, key_cols=["doc_id"], bucketed_min_partitions=0
    ).collect()
    ranks = sorted(r["shuffle_rank"] for r in out)
    assert ranks == list(range(1, 4001))  # strict permutation
    by_id = {r["doc_id"]: r["shuffle_rank"] for r in out}
    # not the identity order (it's a hash order)
    assert [by_id[i] for i in range(100)] != sorted(
        by_id[i] for i in range(100)
    )
    # deterministic across reruns and repartitionings
    again = {
        r["doc_id"]: r["shuffle_rank"]
        for r in shuffle_rows(
            scored_df.repartition(13), seed=5, key_cols=["doc_id"],
            bucketed_min_partitions=0,
        ).collect()
    }
    assert again == by_id
    # different seed -> different order
    other = {
        r["doc_id"]: r["shuffle_rank"]
        for r in shuffle_rows(
            scored_df, seed=6, key_cols=["doc_id"], bucketed_min_partitions=0
        ).collect()
    }
    assert other != by_id


def test_shuffle_rows_shards(spark, scored_df):
    from sketchlib.spark.api import shuffle_rows

    out = shuffle_rows(
        scored_df, key_cols=["doc_id"], n_shards=16,
        bucketed_min_partitions=0,
    )
    sizes = [
        r["n"]
        for r in out.groupBy("shard").agg(F.count("*").alias("n")).collect()
    ]
    assert len(sizes) == 16 and max(sizes) - min(sizes) <= 1
