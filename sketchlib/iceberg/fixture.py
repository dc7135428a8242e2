"""Write a local Iceberg-layout table fixture (spec v1 subset).

No Iceberg runtime jar exists in this sandbox, so tests (and the
driver's iceberg query) build a real on-disk Iceberg layout here —
parquet data files plus the Avro metadata chain
(manifest -> manifest list -> vN.metadata.json -> version-hint.text)
with the spec's field names/ids — and the reader side
(sketchlib.iceberg.manifest) resolves it exactly as it would a table
written by the Java/PyIceberg writers.

Supported fixture shapes: multiple append snapshots (older snapshots
see fewer files), DELETED manifest entries in the latest snapshot
(the reader must drop them), and real per-field lower/upper bounds
(so file-level min/max pruning is testable).
"""

from __future__ import annotations

import json
import os
import struct

import pyarrow as pa
import pyarrow.parquet as pq

from sketchlib.iceberg.avro import read_avro, write_avro

_KV = lambda name, vtype: {  # noqa: E731
    "type": "array",
    "items": {
        "type": "record",
        "name": name,
        "fields": [
            {"name": "key", "type": "int"},
            {"name": "value", "type": vtype},
        ],
    },
}

MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
        {
            "name": "data_file",
            "field-id": 2,
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "file_path", "type": "string", "field-id": 100},
                    {"name": "file_format", "type": "string", "field-id": 101},
                    {
                        "name": "partition",
                        "field-id": 102,
                        "type": {"type": "record", "name": "r102", "fields": []},
                    },
                    {"name": "record_count", "type": "long", "field-id": 103},
                    {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
                    {
                        "name": "lower_bounds",
                        "type": ["null", _KV("k126_v127", "bytes")],
                        "field-id": 125,
                    },
                    {
                        "name": "upper_bounds",
                        "type": ["null", _KV("k128_v129", "bytes")],
                        "field-id": 128,
                    },
                ],
            },
        },
    ],
}

MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "added_snapshot_id", "type": ["null", "long"], "field-id": 503},
        {"name": "added_data_files_count", "type": ["null", "int"], "field-id": 504},
        {"name": "existing_data_files_count", "type": ["null", "int"], "field-id": 505},
        {"name": "deleted_data_files_count", "type": ["null", "int"], "field-id": 506},
    ],
}


def _encode_bound(value, typ: pa.DataType) -> bytes | None:
    """Iceberg single-value serialization (little-endian numerics)."""
    if value is None:
        return None
    if pa.types.is_integer(typ):
        return struct.pack("<q", int(value))
    if pa.types.is_floating(typ):
        return struct.pack("<d", float(value))
    return None


def _file_bounds(table: pa.Table) -> tuple[list, list]:
    """Per-field (1-based field id) lower/upper bound key-value lists."""
    import pyarrow.compute as pc

    lowers, uppers = [], []
    for i, col in enumerate(table.columns):
        typ = table.schema.field(i).type
        if not (pa.types.is_integer(typ) or pa.types.is_floating(typ)):
            continue
        if col.null_count == len(col):
            continue
        mm = pc.min_max(col)
        lo = _encode_bound(mm["min"].as_py(), typ)
        hi = _encode_bound(mm["max"].as_py(), typ)
        if lo is not None:
            lowers.append({"key": i + 1, "value": lo})
        if hi is not None:
            uppers.append({"key": i + 1, "value": hi})
    return lowers, uppers


def _iceberg_schema_json(schema: pa.Schema) -> dict:
    def typ(t: pa.DataType) -> str:
        if pa.types.is_integer(t):
            return "long"
        if pa.types.is_floating(t):
            return "double"
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return "string"
        if pa.types.is_boolean(t):
            return "boolean"
        return "binary"

    return {
        "type": "struct",
        "schema-id": 0,
        "fields": [
            {"id": i + 1, "name": f.name, "required": False, "type": typ(f.type)}
            for i, f in enumerate(schema)
        ],
    }


def wrap_existing_parquet(
    location: str,
    data_files: list[str],
    stats_columns: list[str] | None = None,
) -> dict:
    """Write an Iceberg metadata chain OVER existing parquet files —
    the realistic shape for a huge table: data is never rewritten, the
    manifest just records paths + row counts (+ optional min/max bounds
    for ``stats_columns``, read from the parquet footers' row-group
    statistics, so file pruning works without touching data pages).

    Returns the table metadata dict.  The files stay where they are;
    ``location`` holds only the metadata directory."""
    meta_dir = os.path.join(location, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    snapshot_id = 1000
    entries = []
    schema_arrow = None
    for fpath in data_files:
        md = pq.read_metadata(fpath)
        if schema_arrow is None:
            schema_arrow = pq.read_schema(fpath)
        lowers, uppers = [], []
        if stats_columns:
            name_to_idx = {
                schema_arrow.field(i).name: i for i in range(len(schema_arrow))
            }
            for cname in stats_columns:
                ci = name_to_idx.get(cname)
                if ci is None:
                    continue
                typ = schema_arrow.field(ci).type
                lo = hi = None
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ci).statistics
                    if st is None or not st.has_min_max:
                        lo = hi = None
                        break
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                lob = _encode_bound(lo, typ)
                hib = _encode_bound(hi, typ)
                if lob is not None:
                    lowers.append({"key": ci + 1, "value": lob})
                if hib is not None:
                    uppers.append({"key": ci + 1, "value": hib})
        entries.append(
            {
                "status": 1,
                "snapshot_id": snapshot_id,
                "data_file": {
                    "file_path": os.path.abspath(fpath),
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": md.num_rows,
                    "file_size_in_bytes": os.path.getsize(fpath),
                    "lower_bounds": lowers or None,
                    "upper_bounds": uppers or None,
                },
            }
        )
    mpath = os.path.join(meta_dir, f"snap-{snapshot_id}-m0.avro")
    write_avro(mpath, MANIFEST_ENTRY_SCHEMA, entries)
    mlist_path = os.path.join(meta_dir, f"snap-{snapshot_id}.avro")
    write_avro(
        mlist_path,
        MANIFEST_LIST_SCHEMA,
        [
            {
                "manifest_path": mpath,
                "manifest_length": os.path.getsize(mpath),
                "partition_spec_id": 0,
                "added_snapshot_id": snapshot_id,
                "added_data_files_count": len(entries),
                "existing_data_files_count": 0,
                "deleted_data_files_count": 0,
            }
        ],
    )
    meta = {
        "format-version": 1,
        "table-uuid": "00000000-0000-0000-0000-000000000001",
        "location": location,
        "last-updated-ms": 0,
        "last-column-id": len(schema_arrow) if schema_arrow is not None else 0,
        "schema": _iceberg_schema_json(schema_arrow)
        if schema_arrow is not None
        else {"type": "struct", "schema-id": 0, "fields": []},
        "partition-spec": [],
        "properties": {},
        "current-snapshot-id": snapshot_id,
        "snapshots": [
            {
                "snapshot-id": snapshot_id,
                "timestamp-ms": 0,
                "manifest-list": mlist_path,
                "summary": {"operation": "append"},
            }
        ],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh, indent=1)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")
    return meta


def write_iceberg_table(
    location: str,
    appends: list[pa.Table],
    rows_per_file: int = 1 << 20,
    delete_first_n_at_last_snapshot: int = 0,
) -> dict:
    """Write an Iceberg-layout table: one append snapshot per table in
    ``appends``; the latest snapshot optionally marks the first N data
    files DELETED (manifest entries with status=2, excluded from the
    live file set).  Returns the table metadata dict."""
    data_dir = os.path.join(location, "data")
    meta_dir = os.path.join(location, "metadata")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(meta_dir, exist_ok=True)

    all_files: list[dict] = []  # {"path","rows","size","lowers","uppers","snap"}
    snapshots_meta = []
    file_idx = 0
    for snap_no, table in enumerate(appends):
        snapshot_id = 1000 + snap_no
        # ---- data files for this append
        added = []
        for start in range(0, max(table.num_rows, 1), rows_per_file):
            chunk = table.slice(start, rows_per_file)
            if chunk.num_rows == 0 and table.num_rows > 0:
                continue
            fpath = os.path.join(data_dir, f"{file_idx:05d}.parquet")
            pq.write_table(chunk, fpath)
            lowers, uppers = _file_bounds(chunk)
            added.append(
                {
                    "path": fpath,
                    "rows": chunk.num_rows,
                    "size": os.path.getsize(fpath),
                    "lowers": lowers,
                    "uppers": uppers,
                    "snap": snapshot_id,
                }
            )
            file_idx += 1
        all_files.extend(added)

        is_last = snap_no == len(appends) - 1
        deleted_paths = set()
        if is_last and delete_first_n_at_last_snapshot:
            deleted_paths = {
                f["path"] for f in all_files[:delete_first_n_at_last_snapshot]
            }

        # ---- one manifest holding the cumulative entries
        entries = []
        for f in all_files:
            if f["path"] in deleted_paths:
                status = 2  # DELETED: dropped by readers of this snapshot
            elif f["snap"] == snapshot_id:
                status = 1  # ADDED in this snapshot
            else:
                status = 0  # EXISTING
            entries.append(
                {
                    "status": status,
                    "snapshot_id": snapshot_id,
                    "data_file": {
                        "file_path": f["path"],
                        "file_format": "PARQUET",
                        "partition": {},
                        "record_count": f["rows"],
                        "file_size_in_bytes": f["size"],
                        "lower_bounds": f["lowers"] or None,
                        "upper_bounds": f["uppers"] or None,
                    },
                }
            )
        mpath = os.path.join(meta_dir, f"snap-{snapshot_id}-m0.avro")
        write_avro(mpath, MANIFEST_ENTRY_SCHEMA, entries)

        mlist_path = os.path.join(meta_dir, f"snap-{snapshot_id}.avro")
        write_avro(
            mlist_path,
            MANIFEST_LIST_SCHEMA,
            [
                {
                    "manifest_path": mpath,
                    "manifest_length": os.path.getsize(mpath),
                    "partition_spec_id": 0,
                    "added_snapshot_id": snapshot_id,
                    "added_data_files_count": len(added),
                    "existing_data_files_count": len(all_files) - len(added),
                    "deleted_data_files_count": len(deleted_paths),
                }
            ],
        )
        snapshots_meta.append(
            {
                "snapshot-id": snapshot_id,
                "timestamp-ms": 0,
                "manifest-list": mlist_path,
                "summary": {"operation": "append" if not deleted_paths else "overwrite"},
            }
        )

    schema_src = appends[0] if appends else pa.table({})
    meta = {
        "format-version": 1,
        "table-uuid": "00000000-0000-0000-0000-000000000000",
        "location": location,
        "last-updated-ms": 0,
        "last-column-id": len(schema_src.schema),
        "schema": _iceberg_schema_json(schema_src.schema),
        "partition-spec": [],
        "properties": {},
        "current-snapshot-id": snapshots_meta[-1]["snapshot-id"]
        if snapshots_meta
        else -1,
        "snapshots": snapshots_meta,
    }
    version = len(appends)
    with open(os.path.join(meta_dir, f"v{version}.metadata.json"), "w") as fh:
        json.dump(meta, fh, indent=1)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write(str(version))
    return meta


def append_snapshot(
    location: str, table: pa.Table, rows_per_file: int = 1 << 20
) -> dict:
    """Append ONE snapshot to an EXISTING jar-free Iceberg table — the
    write path a curation pipeline needs to land its output as Iceberg
    (the module's original fixture writer builds whole tables from
    scratch; this commits incrementally against live metadata):

    1. write the new data files (+ per-file column bounds);
    2. write a cumulative manifest: the CURRENT snapshot's live
       entries carried forward verbatim as EXISTING (status=0) — no
       re-derivation, their data_file structs are copied from the old
       manifest — plus the new files as ADDED (status=1);
    3. write the new manifest list, append the snapshot to the
       metadata, bump ``current-snapshot-id``, and write
       ``v{N+1}.metadata.json`` + ``version-hint.text`` LAST (readers
       following the hint see either the old or the new complete
       version — the standard metadata-swap commit).

    Returns the new metadata dict.  The appended table's column names
    must match the table schema (field order may differ)."""
    from sketchlib.iceberg.manifest import (
        _read_version_hint,
        _resolve,
        load_table_metadata,
    )

    meta = load_table_metadata(location)
    meta_dir = os.path.join(location, "metadata")
    data_dir = os.path.join(location, "data")
    os.makedirs(data_dir, exist_ok=True)
    expect = {f["name"] for f in meta["schema"]["fields"]}
    got = set(table.schema.names)
    if expect != got:
        raise ValueError(
            f"appended schema {sorted(got)} does not match table "
            f"schema {sorted(expect)}"
        )

    snaps = meta.get("snapshots", [])
    cur_id = meta.get("current-snapshot-id", -1)
    new_id = max((s["snapshot-id"] for s in snaps), default=999) + 1

    # carry the current snapshot's live entries forward verbatim
    prior_entries: list[dict] = []
    tbl_location = meta.get("location", "")
    if snaps and cur_id != -1:
        snap = next(s for s in snaps if s["snapshot-id"] == cur_id)
        mlist = _resolve(location, tbl_location, snap["manifest-list"])
        _s, manifests = read_avro(mlist)
        for m in manifests:
            _ms, entries = read_avro(
                _resolve(location, tbl_location, m["manifest_path"])
            )
            for e in entries:
                if e.get("status") == 2:
                    continue
                prior_entries.append(
                    {
                        "status": 0,
                        "snapshot_id": new_id,
                        "data_file": e["data_file"],
                    }
                )

    added_entries: list[dict] = []
    for i, start in enumerate(range(0, max(table.num_rows, 1), rows_per_file)):
        chunk = table.slice(start, rows_per_file)
        if chunk.num_rows == 0 and table.num_rows > 0:
            continue
        fpath = os.path.join(data_dir, f"snap{new_id}-{i:05d}.parquet")
        pq.write_table(chunk, fpath)
        lowers, uppers = _file_bounds(chunk)
        added_entries.append(
            {
                "status": 1,
                "snapshot_id": new_id,
                "data_file": {
                    "file_path": fpath,
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": chunk.num_rows,
                    "file_size_in_bytes": os.path.getsize(fpath),
                    "lower_bounds": lowers or None,
                    "upper_bounds": uppers or None,
                },
            }
        )

    mpath = os.path.join(meta_dir, f"snap-{new_id}-m0.avro")
    write_avro(mpath, MANIFEST_ENTRY_SCHEMA, prior_entries + added_entries)
    mlist_path = os.path.join(meta_dir, f"snap-{new_id}.avro")
    write_avro(
        mlist_path,
        MANIFEST_LIST_SCHEMA,
        [
            {
                "manifest_path": mpath,
                "manifest_length": os.path.getsize(mpath),
                "partition_spec_id": 0,
                "added_snapshot_id": new_id,
                "added_data_files_count": len(added_entries),
                "existing_data_files_count": len(prior_entries),
                "deleted_data_files_count": 0,
            }
        ],
    )
    meta["snapshots"] = snaps + [
        {
            "snapshot-id": new_id,
            "timestamp-ms": 0,
            "manifest-list": mlist_path,
            "summary": {"operation": "append"},
        }
    ]
    meta["current-snapshot-id"] = new_id
    cur_meta_path = _read_version_hint(location)
    cur_v = os.path.basename(cur_meta_path).split(".")[0].lstrip("v")
    version = (int(cur_v) if cur_v.isdigit() else len(meta["snapshots"])) + 1
    with open(os.path.join(meta_dir, f"v{version}.metadata.json"), "w") as fh:
        json.dump(meta, fh, indent=1)
    # hint LAST: the commit point
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write(str(version))
    return meta
