"""Minimal Apache Avro object-container-file codec (pure Python).

Iceberg's metadata tree is JSON + AVRO: the manifest list and every
manifest file are Avro object container files.  This repo needs just
enough Avro to REPLAY that tree (iceberg_import.py) and to hand-author
spec-shaped fixtures in tests — not a general Avro stack — so the
format is implemented here from the public specification
(https://avro.apache.org/docs/1.11.1/specification/) instead of
importing a library the runtime does not ship:

* object container file: ``Obj\\x01`` magic, a file-metadata map
  (``avro.schema`` JSON, ``avro.codec``), a 16-byte sync marker, then
  blocks of ``<record count><byte size><payload><sync>``;
* binary encoding: zig-zag varint longs, little-endian float/double,
  length-prefixed bytes/strings, index-prefixed unions, counted blocks
  for arrays/maps (negative count = size-prefixed form), records as
  field concatenation;
* codecs: ``null`` and ``deflate`` (raw zlib, the two Iceberg writers
  actually emit for metadata); anything else refuses loudly by name.

Schema resolution is WRITER-SCHEMA ONLY (the container file embeds
it), which is exactly the manifest-reading contract — Iceberg readers
evolve via field ids at the metadata level, not via Avro reader-schema
resolution.  Decoding is driver-side and O(manifest bytes): manifests
are KBs-per-thousands-of-files, the same metadata-scale budget as the
Delta log replay in delta_export.py.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------- decode
class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise ValueError("truncated Avro data")
        self.pos += n
        return b

    def long(self) -> int:
        """zig-zag varint."""
        shift = 0
        acc = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def decode(self, schema):
        if isinstance(schema, str):
            t = schema
        elif isinstance(schema, list):  # union: index-prefixed
            return self.decode(schema[self.long()])
        else:
            t = schema["type"]
        if t == "null":
            return None
        if t == "boolean":
            return self.read(1) != b"\x00"
        if t in ("int", "long"):
            return self.long()
        if t == "float":
            return struct.unpack("<f", self.read(4))[0]
        if t == "double":
            return struct.unpack("<d", self.read(8))[0]
        if t == "bytes":
            return self.read(self.long())
        if t == "string":
            return self.read(self.long()).decode("utf-8")
        if t == "fixed":
            return self.read(int(schema["size"]))
        if t == "enum":
            return schema["symbols"][self.long()]
        if t == "array":
            out = []
            while True:
                n = self.long()
                if n == 0:
                    return out
                if n < 0:
                    self.long()  # block byte size: skippable form
                    n = -n
                for _ in range(n):
                    out.append(self.decode(schema["items"]))
        if t == "map":
            out = {}
            while True:
                n = self.long()
                if n == 0:
                    return out
                if n < 0:
                    self.long()
                    n = -n
                for _ in range(n):
                    k = self.read(self.long()).decode("utf-8")
                    out[k] = self.decode(schema["values"])
        if t == "record":
            return {
                f["name"]: self.decode(f["type"])
                for f in schema["fields"]
            }
        if t == "union":
            return self.decode(schema["types"][self.long()])
        raise ValueError(f"unsupported Avro type {t!r}")


def read_avro(path: str) -> tuple[dict, list[dict]]:
    """Object container file -> (writer schema, records)."""
    with open(path, "rb") as f:
        data = f.read()
    r = _Reader(data)
    if r.read(4) != _MAGIC:
        raise ValueError(f"{path} is not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            r.long()
            n = -n
        for _ in range(n):
            k = r.read(r.long()).decode("utf-8")
            meta[k] = r.read(r.long())
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(
            f"unsupported Avro codec {codec!r} in {path} "
            "(supported: null, deflate)"
        )
    sync = r.read(16)
    records: list[dict] = []
    while r.pos < len(data):
        count = r.long()
        size = r.long()
        payload = r.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        br = _Reader(payload)
        for _ in range(count):
            records.append(br.decode(schema))
        if r.read(16) != sync:
            raise ValueError(f"sync-marker mismatch in {path}")
    return schema, records


# ---------------------------------------------------------------- encode
class _Writer:
    def __init__(self):
        self.out = io.BytesIO()

    def write(self, b: bytes):
        self.out.write(b)

    def long(self, v: int):
        v = (v << 1) ^ (v >> 63)  # zig-zag
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                self.out.write(bytes([b | 0x80]))
            else:
                self.out.write(bytes([b]))
                return

    def encode(self, schema, value):
        if isinstance(schema, str):
            t = schema
        elif isinstance(schema, list):  # union: pick first matching
            for i, branch in enumerate(schema):
                if _matches(branch, value):
                    self.long(i)
                    return self.encode(branch, value)
            raise ValueError(f"no union branch for {value!r} in {schema}")
        else:
            t = schema["type"]
        if t == "null":
            return None
        if t == "boolean":
            return self.write(b"\x01" if value else b"\x00")
        if t in ("int", "long"):
            return self.long(int(value))
        if t == "float":
            return self.write(struct.pack("<f", float(value)))
        if t == "double":
            return self.write(struct.pack("<d", float(value)))
        if t == "bytes":
            self.long(len(value))
            return self.write(bytes(value))
        if t == "string":
            b = value.encode("utf-8")
            self.long(len(b))
            return self.write(b)
        if t == "fixed":
            if len(value) != int(schema["size"]):
                raise ValueError("fixed size mismatch")
            return self.write(bytes(value))
        if t == "enum":
            return self.long(schema["symbols"].index(value))
        if t == "array":
            if value:
                self.long(len(value))
                for v in value:
                    self.encode(schema["items"], v)
            return self.long(0)
        if t == "map":
            if value:
                self.long(len(value))
                for k, v in value.items():
                    self.encode("string", k)
                    self.encode(schema["values"], v)
            return self.long(0)
        if t == "record":
            for f in schema["fields"]:
                self.encode(f["type"], value.get(f["name"]))
            return None
        raise ValueError(f"unsupported Avro type {t!r}")


def _matches(schema, value) -> bool:
    t = schema if isinstance(schema, str) else schema.get("type")
    if value is None:
        return t == "null"
    if t == "null":
        return False
    if isinstance(value, bool):
        return t == "boolean"
    if isinstance(value, int):
        return t in ("int", "long")
    if isinstance(value, float):
        return t in ("float", "double")
    if isinstance(value, str):
        return t in ("string", "enum")
    if isinstance(value, (bytes, bytearray)):
        return t in ("bytes", "fixed")
    if isinstance(value, dict):
        return t in ("record", "map")
    if isinstance(value, list):
        return t == "array"
    return False


def write_avro(
    path: str, schema: dict, records: list[dict], sync: bytes | None = None
) -> None:
    """Write an object container file (codec ``null`` — fixtures and
    mirrors don't need compression)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    w = _Writer()
    w.write(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": b"null",
    }
    w.long(len(meta))
    for k, v in meta.items():
        w.encode("string", k)
        w.long(len(v))
        w.write(v)
    w.long(0)
    sync = sync or b"\x42" * 16
    w.write(sync)
    body = _Writer()
    for rec in records:
        body.encode(schema, rec)
    payload = body.out.getvalue()
    w.long(len(records))
    w.long(len(payload))
    w.write(payload)
    w.write(sync)
    with open(path, "wb") as f:
        f.write(w.out.getvalue())
