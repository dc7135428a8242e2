"""Deterministic train/eval/test splitting
(sketchlib/spark/api.split_by_weights / split_train_eval).

The contract under test: splits are disjoint and exhaustive by
construction, membership is a pure function of the row key (stable
under repartitioning AND under input growth), and each split is a
shuffle-free map-side filter."""

import pytest
from pyspark.sql import functions as F

from sketchlib.spark.api import split_by_weights, split_train_eval


@pytest.fixture(scope="module")
def ids_df(spark):
    return spark.range(0, 5000).withColumnRenamed("id", "doc_id")


def test_disjoint_and_exhaustive(spark, ids_df):
    parts = split_by_weights(
        ids_df, {"train": 0.8, "val": 0.1, "test": 0.1}, key_cols=["doc_id"]
    )
    assert set(parts) == {"train", "val", "test"}
    sets = {n: {r[0] for r in df.collect()} for n, df in parts.items()}
    all_ids = set(range(5000))
    assert sets["train"] | sets["val"] | sets["test"] == all_ids
    assert not sets["train"] & sets["val"]
    assert not sets["train"] & sets["test"]
    assert not sets["val"] & sets["test"]
    # calibration: hash key is near-uniform, so within a few percent
    assert abs(len(sets["train"]) / 5000 - 0.8) < 0.03
    assert abs(len(sets["val"]) / 5000 - 0.1) < 0.03


def test_weight_normalization(spark, ids_df):
    """{3, 1} and {0.75, 0.25} describe the same ranges."""
    a = split_by_weights(ids_df, {"a": 3.0, "b": 1.0}, key_cols=["doc_id"])
    b = split_by_weights(ids_df, {"a": 0.75, "b": 0.25}, key_cols=["doc_id"])
    for name in ("a", "b"):
        assert {r[0] for r in a[name].collect()} == {
            r[0] for r in b[name].collect()
        }


def test_stable_under_growth_and_repartition(spark, ids_df):
    """The property an eval holdout needs: a row's split NEVER changes
    when other rows arrive or the layout changes."""
    small = ids_df.filter(F.col("doc_id") < 1000)
    ev_small = {
        r[0]
        for r in split_train_eval(small, 0.125, key_cols=["doc_id"])[1].collect()
    }
    ev_full = {
        r[0]
        for r in split_train_eval(ids_df, 0.125, key_cols=["doc_id"])[1]
        .filter(F.col("doc_id") < 1000)
        .collect()
    }
    assert ev_small == ev_full
    ev_repart = {
        r[0]
        for r in split_train_eval(
            ids_df.repartition(17), 0.125, key_cols=["doc_id"]
        )[1]
        .filter(F.col("doc_id") < 1000)
        .collect()
    }
    assert ev_repart == ev_small


def test_last_range_pinned_covers_domain(spark, ids_df):
    """Three equal thirds don't divide 2^20 — rounding must never
    orphan rows at the top of the hash domain."""
    parts = split_by_weights(
        ids_df, {"a": 1.0, "b": 1.0, "c": 1.0}, key_cols=["doc_id"]
    )
    total = sum(df.count() for df in parts.values())
    assert total == 5000


def test_key_expr_override_exact(spark, ids_df):
    """A caller-supplied integer key makes membership engine-portable:
    check the exact arithmetic rule."""
    key = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(1 << 20))
    train, ev = split_train_eval(ids_df, 0.125, key_expr=key)
    got_eval = {r[0] for r in ev.collect()}
    # split_train_eval lists eval first, so it owns the LOW range
    want_eval = {
        i for i in range(5000) if (i * 2654435761) % (1 << 20) < 131072
    }
    assert got_eval == want_eval
    assert {r[0] for r in train.collect()} == set(range(5000)) - want_eval


def test_no_shuffle_in_plan(spark, ids_df, tmp_path):
    """Each split is ONE map-side filter on the scan — no Exchange."""
    path = str(tmp_path / "ids")
    ids_df.write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    train, _ = split_train_eval(df, 0.1, key_cols=["doc_id"])
    plan = train._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Filter" in plan


def test_validation_errors(spark, ids_df):
    with pytest.raises(ValueError, match="non-empty"):
        split_by_weights(ids_df, {})
    with pytest.raises(ValueError, match="must be > 0"):
        split_by_weights(ids_df, {"a": 1.0, "b": 0.0})
    with pytest.raises(ValueError, match="eval_fraction"):
        split_train_eval(ids_df, 1.0)
    with pytest.raises(ValueError, match="eval_fraction"):
        split_train_eval(ids_df, 0.0)


def test_seed_changes_assignment_but_keeps_partition(spark, ids_df):
    e1 = {
        r[0]
        for r in split_train_eval(ids_df, 0.5, key_cols=["doc_id"], seed=1)[
            1
        ].collect()
    }
    e2 = {
        r[0]
        for r in split_train_eval(ids_df, 0.5, key_cols=["doc_id"], seed=2)[
            1
        ].collect()
    }
    assert e1 != e2  # different seeds reshuffle membership...
    assert abs(len(e1) / 5000 - 0.5) < 0.03  # ...but keep calibration
    assert abs(len(e2) / 5000 - 0.5) < 0.03


def test_tiny_weight_empty_range_raises(spark, ids_df):
    """A weight whose range rounds to zero hash values must fail
    loudly, not silently produce a permanently-empty split."""
    with pytest.raises(ValueError, match="empty hash range"):
        split_by_weights(ids_df, {"holdout": 4e-7, "train": 1.0})


def test_key_expr_out_of_range_folds_not_drops(spark, ids_df):
    """A raw (possibly negative / >2^20) integer key_expr is reduced
    pmod 2^20, keeping the split exhaustive instead of dropping rows
    that match no range."""
    raw = F.xxhash64(F.col("doc_id"))  # full signed-64 range
    parts = split_by_weights(ids_df, {"a": 0.5, "b": 0.5}, key_expr=raw)
    total = sum(df.count() for df in parts.values())
    assert total == 5000


def test_with_split_label_matches_filters(spark, ids_df):
    from sketchlib.spark.api import with_split_label

    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    parts = split_by_weights(ids_df, w, key_cols=["doc_id"])
    want = {
        r[0]: name
        for name, df in parts.items()
        for r in df.select("doc_id").collect()
    }
    got = {
        r["doc_id"]: r["split"]
        for r in with_split_label(ids_df, w, key_cols=["doc_id"]).collect()
    }
    assert got == want
    with pytest.raises(ValueError, match="already exists"):
        with_split_label(
            ids_df.withColumn("split", F.lit("x")), w, key_cols=["doc_id"]
        )
