"""Iceberg table-metadata / manifest parsing (spec v1/v2 subset).

Resolves the metadata chain of an Iceberg table directory without any
runtime jar:

    metadata/version-hint.text -> vN.metadata.json
      -> current snapshot -> manifest list (Avro)
        -> manifest files (Avro) -> live data files

Returns plain ``DataFile`` records (path, format, record count,
per-field lower/upper bounds) ready to feed
``build_partials_direct(files=...)`` — the direct pyarrow scan path
then reads ONLY that snapshot's live files, which is exactly how a
100-TB Iceberg table is scanned: the planner never lists the data
directory, and file-level min/max pruning drops files before any scan
task is scheduled.

Spec references (all public): Iceberg table spec "Manifests" /
"Manifest Lists" / "Table Metadata"; Avro OCF per avro.py.
"""

from __future__ import annotations

import json
import os
import struct
from dataclasses import dataclass, field

from sketchlib.iceberg.avro import read_avro

# manifest_entry.status values (Iceberg spec)
STATUS_EXISTING = 0
STATUS_ADDED = 1
STATUS_DELETED = 2


@dataclass
class DataFile:
    path: str
    file_format: str
    record_count: int
    file_size: int = 0
    # field-id -> decoded bound value (int/float), where decodable
    lower_bounds: dict = field(default_factory=dict)
    upper_bounds: dict = field(default_factory=dict)


def _read_version_hint(table_dir: str) -> str:
    """Path of the current metadata JSON."""
    meta_dir = os.path.join(table_dir, "metadata")
    hint = os.path.join(meta_dir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as fh:
            v = fh.read().strip()
        cand = os.path.join(meta_dir, f"v{v}.metadata.json")
        if os.path.exists(cand):
            return cand
    # fall back: highest vN.metadata.json
    versions = sorted(
        (f for f in os.listdir(meta_dir) if f.endswith(".metadata.json")),
        key=lambda f: int(f.split(".")[0].lstrip("v")) if f.split(".")[0].lstrip("v").isdigit() else -1,
    )
    if not versions:
        raise FileNotFoundError(f"no metadata.json under {meta_dir}")
    return os.path.join(meta_dir, versions[-1])


def load_table_metadata(table_dir: str) -> dict:
    with open(_read_version_hint(table_dir)) as fh:
        return json.load(fh)


def _resolve(table_dir: str, location: str, path: str) -> str:
    """Manifest paths are absolute URIs against the table location at
    write time; remap onto the local table dir so relocated fixtures
    (and copied tables) resolve."""
    cand = _remap(table_dir, location, path)
    if os.path.exists(cand):
        # prefer the remap: a relocated/copied table must resolve to
        # ITS metadata even when the original path still exists
        return cand
    return _strip_scheme(path)


def _strip_scheme(path: str) -> str:
    return path[len("file:"):] if path.startswith("file:") else path


def _remap(table_dir: str, location: str, path: str) -> str:
    """Candidate local path for a manifest-recorded absolute URI."""
    path = _strip_scheme(path)
    if location:
        loc = _strip_scheme(location)
        if path.startswith(loc):
            return os.path.join(table_dir, path[len(loc):].lstrip("/"))
    return path


def _current_schema(meta: dict) -> dict:
    """The table's current schema object: v1 carries a top-level
    ``schema``; v2 carries ``schemas`` + ``current-schema-id`` (falls
    back to the last listed schema when the id is absent)."""
    schema = meta.get("schema")
    if schema is None:
        cur = meta.get("current-schema-id")
        for s in meta.get("schemas", []):
            if s.get("schema-id") == cur:
                return s
        schemas = meta.get("schemas", [])
        schema = schemas[-1] if schemas else {}
    return schema


def schema_field_types(meta: dict) -> dict[int, str]:
    """field-id -> Iceberg type name from the table metadata schema.
    Only primitive type names are kept (struct / list / map bounds are
    not single-value decodable anyway)."""
    out: dict[int, str] = {}
    for f in _current_schema(meta).get("fields", []):
        t = f.get("type")
        if isinstance(t, str):
            out[int(f["id"])] = t
    return out


def schema_field_names(meta: dict) -> dict[int, str]:
    """field-id -> column name from the table metadata schema."""
    return {
        int(f["id"]): f["name"]
        for f in _current_schema(meta).get("fields", [])
    }


def _decode_bound(raw: bytes, typ: str | None):
    """Iceberg single-value serialization, decoded BY DECLARED TYPE —
    an 8-byte bound is a long *or* a double and the raw bit pattern of
    a double compared as int64 mis-prunes (negative doubles even
    order-reverse), so we never guess: unknown/missing type -> None and
    the file is conservatively kept by ``prune_files``."""
    if not isinstance(raw, (bytes, bytearray)) or typ is None:
        return None
    try:
        if typ in ("long", "timestamp", "timestamptz", "time") and len(raw) == 8:
            return struct.unpack("<q", raw)[0]
        if typ in ("int", "date") and len(raw) == 4:
            return struct.unpack("<i", raw)[0]
        if typ == "double" and len(raw) == 8:
            return struct.unpack("<d", raw)[0]
        if typ == "float" and len(raw) == 4:
            return struct.unpack("<f", raw)[0]
        if typ == "string":
            return bytes(raw).decode("utf-8", errors="replace")
    except struct.error:
        return None
    return None


def _bounds_map(entry, field_types: dict[int, str]) -> dict:
    """lower/upper bounds arrive as map<int,bytes> — Avro encodes that
    as array<record{key,value}> or map<string,bytes> depending on the
    writer."""
    out = {}
    if isinstance(entry, dict):
        items = entry.items()
    elif isinstance(entry, list):
        items = ((kv.get("key"), kv.get("value")) for kv in entry)
    else:
        return out
    for k, v in items:
        val = _decode_bound(v, field_types.get(int(k)))
        if val is not None:
            out[int(k)] = val
    return out


def snapshot_data_files(
    table_dir: str, snapshot_id: int | None = None
) -> list[DataFile]:
    """Live data files of a snapshot (default: current snapshot).

    Deleted manifest entries (status=2) are dropped; existing/added
    survive — reading a stale listing instead of the snapshot's
    manifest chain would double-count compacted files and resurrect
    deleted ones."""
    meta = load_table_metadata(table_dir)
    field_types = schema_field_types(meta)
    location = meta.get("location", "")
    snaps = meta.get("snapshots", [])
    if not snaps:
        return []
    if snapshot_id is None:
        snapshot_id = meta.get("current-snapshot-id")
    snap = next(
        (s for s in snaps if s.get("snapshot-id") == snapshot_id), None
    )
    if snap is None:
        raise ValueError(
            f"snapshot {snapshot_id} not found; have "
            f"{[s.get('snapshot-id') for s in snaps]}"
        )
    mlist_path = _resolve(table_dir, location, snap["manifest-list"])
    _schema, manifests = read_avro(mlist_path)
    out: list[DataFile] = []
    for m in manifests:
        mpath = _resolve(table_dir, location, m["manifest_path"])
        _mschema, entries = read_avro(mpath)
        for e in entries:
            if e.get("status") == STATUS_DELETED:
                continue
            df = e["data_file"]
            out.append(
                DataFile(
                    path=df["file_path"],
                    file_format=str(df.get("file_format", "PARQUET")).upper(),
                    record_count=int(df.get("record_count", 0)),
                    file_size=int(df.get("file_size_in_bytes", 0) or 0),
                    lower_bounds=_bounds_map(df.get("lower_bounds"), field_types),
                    upper_bounds=_bounds_map(df.get("upper_bounds"), field_types),
                )
            )
    # Data-file path resolution is ALL-OR-NOTHING: either every live
    # file remaps onto this table dir (relocated/copied table) or every
    # path is taken verbatim from the manifest (authoritative URIs).
    # A per-file fallback would silently mix two table roots — e.g. a
    # locally-missing file would be read from the ORIGINAL location,
    # masking corruption with another table's data.
    remapped = [_remap(table_dir, location, f.path) for f in out]
    if remapped and all(os.path.exists(p) for p in remapped):
        for f, p in zip(out, remapped):
            f.path = p
    else:
        for f in out:
            f.path = _strip_scheme(f.path)
    return out


def prune_files(
    files: list[DataFile],
    field_id: int,
    min_value=None,
    max_value=None,
) -> list[DataFile]:
    """File-level min/max pruning: keep files whose [lower, upper]
    range for ``field_id`` can intersect [min_value, max_value].
    Files without bounds for the field are conservatively kept."""
    kept = []
    for f in files:
        lo = f.lower_bounds.get(field_id)
        hi = f.upper_bounds.get(field_id)
        if lo is None or hi is None:
            kept.append(f)
            continue
        if max_value is not None and lo > max_value:
            continue
        if min_value is not None and hi < min_value:
            continue
        kept.append(f)
    return kept


def snapshot_file_paths(
    table_dir: str,
    snapshot_id: int | None = None,
    parquet_only: bool = True,
) -> list[str]:
    """Convenience: the snapshot's live file paths, ready for
    ``build_partials_direct(files=...)``."""
    files = snapshot_data_files(table_dir, snapshot_id)
    if parquet_only:
        bad = [f.path for f in files if f.file_format != "PARQUET"]
        if bad:
            raise ValueError(f"non-parquet data files in snapshot: {bad[:3]}")
    return [f.path for f in files]
