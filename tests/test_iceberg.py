"""Iceberg manifest direct-scan: Avro OCF codec, manifest-chain
resolution (snapshots, deletes, bounds pruning), and the end-to-end
sketch build over a snapshot's live files (SURVEY §7.0 north-rule
mandate; no runtime jar in this sandbox, so the fixture writes the
spec layout itself)."""

import os
import zlib

import numpy as np
import pyarrow as pa
import pytest

from sketchlib.iceberg import (
    prune_files,
    read_avro,
    snapshot_data_files,
    snapshot_file_paths,
    write_avro,
)
from sketchlib.iceberg.fixture import write_iceberg_table


def _table(lo: int, hi: int) -> pa.Table:
    ids = np.arange(lo, hi, dtype=np.int64)
    return pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "v": pa.array(ids * 1.0, pa.float64()),
            "s": pa.array([f"r{i}" for i in ids], pa.string()),
        }
    )


@pytest.fixture(scope="module")
def tbl(tmp_path_factory):
    """2-snapshot table: snap 1000 = rows [0,100) in 3 files; snap 1001
    appends [100,250) in 4 files and DELETES the first file."""
    loc = str(tmp_path_factory.mktemp("iceberg") / "tbl")
    write_iceberg_table(
        loc, [_table(0, 100), _table(100, 250)], rows_per_file=40,
        delete_first_n_at_last_snapshot=1,
    )
    return loc


def test_avro_roundtrip():
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "n", "type": ["null", "long"]},
            {"name": "f", "type": "double"},
            {"name": "a", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "bytes"}},
            {"name": "b", "type": "boolean"},
        ],
    }
    recs = [
        {"s": "héllo", "n": None, "f": -1.25, "a": [1, -2, 3], "m": {"k": b"\x00\xff"}, "b": True},
        {"s": "", "n": -(2**40), "f": 0.0, "a": [], "m": {}, "b": False},
    ]
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.avro")
        write_avro(p, schema, recs)
        got_schema, got = read_avro(p)
        assert got == recs
        assert got_schema["name"] == "t"


def test_avro_deflate_codec():
    """Real Iceberg writers emit deflate blocks; the reader must
    decompress them."""
    import io as _io
    import json
    import struct
    import tempfile

    from sketchlib.iceberg.avro import _encode, _write_long, _read_long  # noqa

    schema = {"type": "record", "name": "r",
              "fields": [{"name": "x", "type": "long"}]}
    recs = [{"x": i} for i in range(100)]
    payload = bytearray()
    for r in recs:
        _encode(payload, schema, r)
    compressed = zlib.compress(bytes(payload), 6)[2:-4]  # raw deflate
    out = bytearray(b"Obj\x01")
    _encode(
        out,
        {"type": "map", "values": "bytes"},
        {"avro.schema": json.dumps(schema).encode(), "avro.codec": b"deflate"},
    )
    sync = b"\x01" * 16
    out += sync
    _write_long(out, len(recs))
    _write_long(out, len(compressed))
    out += compressed + sync
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "d.avro")
        open(p, "wb").write(bytes(out))
        _s, got = read_avro(p)
        assert got == recs


def test_snapshot_live_files(tbl):
    cur = snapshot_data_files(tbl)
    # snap 1001: 3 + 4 files, minus 1 deleted
    assert len(cur) == 6
    assert sum(f.record_count for f in cur) == 250 - 40
    assert all(f.file_format == "PARQUET" for f in cur)
    assert all(os.path.exists(f.path) for f in cur)


def test_snapshot_time_travel(tbl):
    old = snapshot_data_files(tbl, snapshot_id=1000)
    assert len(old) == 3
    assert sum(f.record_count for f in old) == 100
    with pytest.raises(ValueError, match="snapshot 99 not found"):
        snapshot_data_files(tbl, snapshot_id=99)


def test_bounds_pruning(tbl):
    cur = snapshot_data_files(tbl)
    pruned = prune_files(cur, field_id=1, min_value=200)
    assert sum(f.record_count for f in pruned) == 70  # [180,220)+[220,250)
    assert len(pruned) == 2
    # no bounds for a string field id -> conservatively kept
    assert len(prune_files(cur, field_id=3, min_value=0)) == len(cur)


def test_double_bounds_typed_decode(tmp_path):
    """Bounds must decode by the DECLARED field type: an 8-byte double
    read as int64 mis-orders (negative doubles bit-compare reversed),
    silently mis-pruning floating-point fields."""
    loc = str(tmp_path / "dbl")
    # 4 files: v ranges [-100,-51], [-50,-1], [0,49], [50,99]
    write_iceberg_table(loc, [_table(-100, 100)], rows_per_file=50)
    files = snapshot_data_files(loc)
    assert len(files) == 4
    by_lo = sorted(files, key=lambda f: f.lower_bounds[2])
    # field 2 is the double column: bounds decode to the real floats
    assert by_lo[0].lower_bounds[2] == -100.0
    assert by_lo[0].upper_bounds[2] == -51.0
    assert isinstance(by_lo[0].lower_bounds[2], float)
    # prune v >= -0.5 keeps only the two non-negative files
    pruned = prune_files(files, field_id=2, min_value=-0.5)
    assert sorted(f.lower_bounds[2] for f in pruned) == [0.0, 50.0]
    # prune v <= -60.5 keeps only the most-negative file
    pruned = prune_files(files, field_id=2, max_value=-60.5)
    assert [f.lower_bounds[2] for f in pruned] == [-100.0]


def test_sketch_iceberg_end_to_end(spark, tbl):
    """t-digest over the live snapshot through the manifest chain must
    see exactly the live rows (deleted file's rows absent)."""
    from sketchlib.core.tdigest import TDigest
    from sketchlib.spark.direct import sketch_iceberg

    sk = sketch_iceberg(
        spark, tbl, "v", lambda: TDigest(delta=500), snapshot_id=None
    )
    assert sk.count == 210  # 250 minus the 40 deleted rows
    # live values are [40, 250); the exact median of that range
    exact = np.median(np.arange(40, 250))
    assert abs(sk.value_at_quantile(0.5) - exact) <= 3.0

    old = sketch_iceberg(spark, tbl, "v", lambda: TDigest(delta=500),
                         snapshot_id=1000)
    assert old.count == 100

    pruned = sketch_iceberg(
        spark, tbl, "v", lambda: TDigest(delta=500),
        prune_field_id=1, prune_min=200,
    )
    assert pruned.count == 70


def test_read_table_auto_iceberg(spark, tbl):
    """read_table must auto-detect the Iceberg dir and scan only live
    files (a raw parquet read of data/ would see the deleted rows)."""
    from sketchlib.spark.io import read_table

    df = read_table(spark, tbl)
    assert df.count() == 210
    assert df.agg({"id": "min"}).first()[0] == 40  # deleted file excluded
    old = read_table(spark, tbl, fmt="iceberg", snapshot_id=1000)
    assert old.count() == 100
    # raw listing WOULD see all 250 rows — proves the manifest matters
    raw = spark.read.parquet(os.path.join(tbl, "data"))
    assert raw.count() == 250
    # snapshot_id on a non-iceberg source must raise, never be ignored
    with pytest.raises(ValueError, match="snapshot_id"):
        read_table(spark, os.path.join(tbl, "data"), fmt="parquet",
                   snapshot_id=1000)
    with pytest.raises(ValueError, match="snapshot_id"):
        read_table(spark, os.path.join(tbl, "data"), snapshot_id=1000)


def test_relocated_table(tbl, tmp_path):
    """Manifest paths are absolute at write time; a copied/relocated
    table must still resolve (path remap against table location)."""
    import shutil

    dst = str(tmp_path / "moved")
    shutil.copytree(tbl, dst)
    files = snapshot_data_files(dst)
    assert len(files) == 6
    assert all(os.path.exists(f.path) for f in files)
    assert all(f.path.startswith(dst) for f in files)


def test_wrap_existing_parquet(spark, tmp_path):
    """Metadata-only table over pre-existing parquet files: data files
    are never rewritten; record counts and min/max bounds come from the
    parquet footers (the realistic shape for a 10^12-row table)."""
    import pyarrow.parquet as pq

    from sketchlib.iceberg.fixture import wrap_existing_parquet

    data = str(tmp_path / "raw")
    os.makedirs(data)
    paths = []
    for i in range(4):
        t = _table(i * 50, (i + 1) * 50)
        p = os.path.join(data, f"part{i}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    loc = str(tmp_path / "meta_only")
    wrap_existing_parquet(loc, paths, stats_columns=["id", "v"])
    files = snapshot_data_files(loc)
    assert len(files) == 4
    assert sum(f.record_count for f in files) == 200
    # footer-derived bounds enable pruning without touching data pages
    pruned = prune_files(files, field_id=1, min_value=150)
    assert [f.record_count for f in pruned] == [50]
    # and the spark read sees exactly the wrapped rows
    from sketchlib.spark.io import read_table

    assert read_table(spark, loc).count() == 200


def test_append_snapshot_commit(tmp_path, spark):
    """Jar-free append commit: new data files + cumulative manifest
    (prior live entries carried forward verbatim), metadata version
    bump committed via the version hint.  Readers see the union at the
    new snapshot and the old set via time travel; pruning bounds exist
    for the appended files; the direct sketch path reads the result."""
    import pyarrow as pa

    from sketchlib.iceberg.fixture import append_snapshot, write_iceberg_table
    from sketchlib.iceberg.manifest import load_table_metadata, snapshot_data_files

    loc = str(tmp_path / "appendtbl")
    t1 = pa.table({"doc_id": pa.array(range(0, 100), pa.int64()),
                   "n_tok": pa.array([7] * 100, pa.int64())})
    write_iceberg_table(loc, [t1])
    before = snapshot_data_files(loc)
    meta0 = load_table_metadata(loc)

    t2 = pa.table({"doc_id": pa.array(range(100, 150), pa.int64()),
                   "n_tok": pa.array([11] * 50, pa.int64())})
    meta = append_snapshot(loc, t2)
    assert meta["current-snapshot-id"] != meta0["current-snapshot-id"]

    after = snapshot_data_files(loc)
    assert {f.path for f in before} <= {f.path for f in after}
    assert sum(f.record_count for f in after) == 150
    # time travel to the pre-append snapshot still sees only t1
    old = snapshot_data_files(loc, snapshot_id=meta0["current-snapshot-id"])
    assert sum(f.record_count for f in old) == 100
    # direct sketch over the appended table: count covers both snaps
    from sketchlib.core.tdigest import TDigest
    from sketchlib.spark.aggregate import KIND_DOUBLE
    from sketchlib.spark.direct import sketch_iceberg

    sk = sketch_iceberg(
        spark, loc, "n_tok", lambda: TDigest(delta=200), KIND_DOUBLE
    )
    assert sk.count == 150
    # schema mismatch rejected
    bad = pa.table({"other": pa.array([1], pa.int64())})
    import pytest as _pytest

    with _pytest.raises(ValueError, match="schema"):
        append_snapshot(loc, bad)
    # second append stacks on the first
    t3 = pa.table({"doc_id": pa.array(range(150, 160), pa.int64()),
                   "n_tok": pa.array([3] * 10, pa.int64())})
    append_snapshot(loc, t3)
    assert sum(f.record_count for f in snapshot_data_files(loc)) == 160


def test_read_table_jsonl_and_csv(spark, tmp_path):
    """read_table reads JSON Lines and CSV sources (explicit fmt and
    extension auto-detect) with values intact."""
    from sketchlib.spark.io import read_table

    jl = tmp_path / "docs.jsonl"
    jl.write_text(
        '{"doc_id": 1, "text": "hello world"}\n'
        '{"doc_id": 2, "text": "bye"}\n'
    )
    for fmt in ("jsonl", "auto"):
        got = {
            r["doc_id"]: r["text"]
            for r in read_table(spark, str(jl), fmt).collect()
        }
        assert got == {1: "hello world", 2: "bye"}

    cv = tmp_path / "docs.csv"
    cv.write_text("doc_id,text\n1,hello\n2,bye\n")
    for fmt in ("csv", "auto"):
        got = {
            r["doc_id"]: r["text"]
            for r in read_table(spark, str(cv), fmt).collect()
        }
        assert got == {1: "hello", 2: "bye"}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="snapshot_id"):
        read_table(spark, str(jl), "jsonl", snapshot_id=1)
