"""Minimal Apache Avro Object Container File codec (reader + writer).

Iceberg stores its manifest lists and manifest files as Avro OCF; this
sandbox has no avro library, so the subset of the public Avro 1.11
spec needed to read (and, for fixtures, write) those files is
implemented here:

* primitives: null, boolean, int, long (zigzag varints), float,
  double, bytes, string, fixed, enum
* complex: record, array, map (block-encoded), union
* container: header magic ``Obj\\x01``, file-metadata map carrying
  ``avro.schema`` (JSON) + ``avro.codec``, 16-byte sync marker,
  data blocks of (record count, byte size, payload, sync)
* codecs: ``null`` and ``deflate`` (raw zlib) — the two Iceberg
  writers emit in practice

The reader is schema-driven (decodes whatever the embedded writer
schema declares, returning plain dicts/lists), so manifests written by
real Iceberg writers parse as long as they stay within the types
above.  The writer always emits the ``null`` codec.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

_MAGIC = b"Obj\x01"


# ----------------------------------------------------------------- primitives


def _read_long(buf: io.BytesIO) -> int:
    """Zigzag varint."""
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_long(out: bytearray, v: int) -> None:
    v = (v << 1) ^ (v >> 63) if v >= 0 else ((-v - 1) << 1 | 1)
    # zigzag then varint
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            break


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


def _write_bytes(out: bytearray, data: bytes) -> None:
    _write_long(out, len(data))
    out.extend(data)


# --------------------------------------------------------------- schema walk


def _decode(buf: io.BytesIO, schema) -> object:
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return buf.read(1) == b"\x01"
        if t in ("int", "long"):
            return _read_long(buf)
        if t == "float":
            return struct.unpack("<f", buf.read(4))[0]
        if t == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if t == "bytes":
            return _read_bytes(buf)
        if t == "string":
            return _read_bytes(buf).decode("utf-8")
        raise ValueError(f"unsupported avro type {t!r}")
    if isinstance(schema, list):  # union: branch index then value
        idx = _read_long(buf)
        return _decode(buf, schema[idx])
    t = schema["type"]
    if t == "record":
        return {f["name"]: _decode(buf, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:  # block byte-size prefix follows (skippable form)
                _read_long(buf)
                n = -n
            for _ in range(n):
                out.append(_decode(buf, schema["items"]))
        return out
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(buf, schema["values"])
        return out
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "enum":
        return schema["symbols"][_read_long(buf)]
    # named-type wrapper like {"type": "string", "logicalType": ...}
    if isinstance(t, (str, list, dict)) and "fields" not in schema:
        return _decode(buf, t)
    raise ValueError(f"unsupported avro schema {schema!r}")


def _encode(out: bytearray, schema, value) -> None:
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return
        if t == "boolean":
            out.append(1 if value else 0)
        elif t in ("int", "long"):
            _write_long(out, int(value))
        elif t == "float":
            out.extend(struct.pack("<f", float(value)))
        elif t == "double":
            out.extend(struct.pack("<d", float(value)))
        elif t == "bytes":
            _write_bytes(out, bytes(value))
        elif t == "string":
            _write_bytes(out, str(value).encode("utf-8"))
        else:
            raise ValueError(f"unsupported avro type {t!r}")
        return
    if isinstance(schema, list):  # union: pick the branch by value
        idx = _union_branch(schema, value)
        _write_long(out, idx)
        _encode(out, schema[idx], value)
        return
    t = schema["type"]
    if t == "record":
        for f in schema["fields"]:
            _encode(out, f["type"], value[f["name"]])
    elif t == "array":
        if value:
            _write_long(out, len(value))
            for item in value:
                _encode(out, schema["items"], item)
        _write_long(out, 0)
    elif t == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                _write_bytes(out, str(k).encode("utf-8"))
                _encode(out, schema["values"], v)
        _write_long(out, 0)
    elif t == "fixed":
        out.extend(bytes(value))
    elif t == "enum":
        _write_long(out, schema["symbols"].index(value))
    else:
        _encode(out, t, value)


def _union_branch(union: list, value) -> int:
    def matches(s, v):
        name = s if isinstance(s, str) else s.get("type")
        if v is None:
            return name == "null"
        if name == "null":
            return False
        if isinstance(v, bool):
            return name == "boolean"
        if isinstance(v, int):
            return name in ("int", "long")
        if isinstance(v, float):
            return name in ("float", "double")
        if isinstance(v, str):
            return name in ("string", "enum")
        if isinstance(v, (bytes, bytearray)):
            return name in ("bytes", "fixed")
        if isinstance(v, dict):
            return name in ("record", "map")
        if isinstance(v, list):
            return name == "array"
        return False

    for i, s in enumerate(union):
        if matches(s, value):
            return i
    raise ValueError(f"no union branch in {union!r} for {type(value)}")


# ------------------------------------------------------------------ container


def read_avro(path: str) -> tuple[dict, list]:
    """Read an Avro OCF: returns (parsed writer schema, records)."""
    with open(path, "rb") as fh:
        data = fh.read()
    buf = io.BytesIO(data)
    if buf.read(4) != _MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    meta_schema = {"type": "map", "values": "bytes"}
    meta = _decode(buf, meta_schema)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    sync = buf.read(16)
    records: list = []
    while buf.tell() < len(data):
        n = _read_long(buf)
        payload = _read_bytes(buf)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        if buf.read(16) != sync:
            raise ValueError(f"{path}: bad block sync marker")
        pbuf = io.BytesIO(payload)
        for _ in range(n):
            records.append(_decode(pbuf, schema))
    return schema, records


def write_avro(path: str, schema: dict, records: list, meta: dict | None = None) -> None:
    """Write an Avro OCF with the ``null`` codec (one data block)."""
    out = bytearray()
    out.extend(_MAGIC)
    header_meta = {"avro.schema": json.dumps(schema).encode("utf-8"),
                   "avro.codec": b"null"}
    for k, v in (meta or {}).items():
        header_meta[k] = v if isinstance(v, bytes) else str(v).encode("utf-8")
    _encode(out, {"type": "map", "values": "bytes"}, header_meta)
    sync = bytes.fromhex("9f8e7d6c5b4a39281716151413121110")  # fixed: deterministic files
    out.extend(sync)
    if records:
        payload = bytearray()
        for r in records:
            _encode(payload, schema, r)
        _write_long(out, len(records))
        _write_bytes(out, bytes(payload))
        out.extend(sync)
    with open(path, "wb") as fh:
        fh.write(bytes(out))
