"""Foreign Delta DELETION VECTOR decoding (r12 verdict task 1).

DVs are on by default in modern Delta writers, so a DV-bearing table
was the refusal a real user hit first (``_gate_foreign_protocol``
refused every add carrying a ``deletionVector``).  This module decodes
the spec's persisted DV format so ``import_delta`` /
``format("delta_import")`` / ``convert_from_delta`` read such tables
correctly instead of refusing.

Everything here is implemented from PUBLIC specifications only:

* Delta deletion-vector descriptor + file layout:
  https://github.com/delta-io/delta/blob/master/PROTOCOL.md
  ("Deletion Vectors" / "Deletion Vector Descriptor Schema" /
  "Deletion Vector Format").  Descriptor fields: ``storageType``
  (``u`` relative file named by a Z85 uuid, ``i`` inline Z85 bytes,
  ``p`` absolute path), ``pathOrInlineDv``, ``offset``,
  ``sizeInBytes`` (raw data size, excluding the length prefix and the
  checksum), ``cardinality``.  DV files start with a format-version
  byte (1); each stored DV is ``[size int32 BE][data][CRC-32 of data,
  int32 BE]`` with ``offset`` pointing at the size field.
* The data payload is a 64-bit "RoaringBitmapArray" in the portable
  format: magic ``1681511377`` (int32 LE), number of 32-bit bitmaps
  (int64 LE), then each 32-bit RoaringBitmap serialized in the
  standard interoperable format —
  https://github.com/RoaringBitmap/RoaringFormatSpec — (little-endian;
  array / bitmap / run containers).  Bitmap ``i`` holds the low 32
  bits of values whose high 32 bits equal ``i``.
* Z85 encoding (the base85 variant the spec names):
  https://rfc.zeromq.org/spec/32/ — 4 bytes -> 5 chars, big-endian
  base 85 over a fixed 85-char alphabet.

The ENCODE side exists so tests can hand-author DV-bearing foreign
tables from the spec (never via the importer's own decode path) and so
the exporter could emit DVs if a mirror ever opts into readerVersion 3.

Scale shape: a DV's serialized size is proportional to that one
file's deleted rows (roaring-compressed).  Decoding happens where the
file is read — executor-side for the Spark scans, driver-side only in
``convert_from_delta`` where the result is immediately re-serialized
to the txn table's own DV payload.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}

MAGIC = 1681511377  # RoaringBitmapArray portable-format magic number
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096  # container cardinality above which bitmaps are used
FORMAT_VERSION = 1  # DV file format-version byte


def z85_encode(data: bytes) -> str:
    """ZeroMQ Z85: each 4-byte group (big-endian) -> 5 base-85 chars."""
    if len(data) % 4:
        raise ValueError(f"Z85 input length {len(data)} not a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        (n,) = struct.unpack(">I", data[i : i + 4])
        chunk = []
        for _ in range(5):
            n, r = divmod(n, 85)
            chunk.append(_Z85_CHARS[r])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(s: str) -> bytes:
    if len(s) % 5:
        raise ValueError(f"Z85 input length {len(s)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(s), 5):
        n = 0
        for c in s[i : i + 5]:
            try:
                n = n * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"invalid Z85 character {c!r}") from None
        if n > 0xFFFFFFFF:
            raise ValueError(f"Z85 group {s[i : i + 5]!r} overflows 4 bytes")
        out += struct.pack(">I", n)
    return bytes(out)


def _decode_rb32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """One 32-bit RoaringBitmap in the portable interoperable format
    starting at ``pos``; returns (sorted values, next position)."""
    start = pos
    (cookie,) = struct.unpack_from("<i", buf, pos)
    pos += 4
    run_flags = b""
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n_containers = (cookie >> 16) + 1
        n_flag_bytes = (n_containers + 7) // 8
        run_flags = buf[pos : pos + n_flag_bytes]
        pos += n_flag_bytes
        has_offsets = n_containers >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n_containers,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        has_offsets = True
    else:
        raise ValueError(f"invalid RoaringBitmap cookie {cookie}")
    keys: list[int] = []
    cards: list[int] = []
    for _ in range(n_containers):
        key, card_m1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys.append(key)
        cards.append(card_m1 + 1)
    offsets: list[int] | None = None
    if has_offsets:
        offsets = list(
            struct.unpack_from(f"<{n_containers}i", buf, pos)
        )
        pos += 4 * n_containers
    values: list[int] = []
    for i in range(n_containers):
        if offsets is not None:
            pos = start + offsets[i]
        base = keys[i] << 16
        is_run = bool(
            run_flags and (run_flags[i // 8] >> (i % 8)) & 1
        )
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                lo, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(range(base + lo, base + lo + length + 1))
        elif cards[i] > _ARRAY_MAX:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for w, word in enumerate(words):
                while word:
                    b = word & -word
                    values.append(base + (w << 6) + b.bit_length() - 1)
                    word ^= b
        else:
            vals = struct.unpack_from(f"<{cards[i]}H", buf, pos)
            pos += 2 * cards[i]
            values.extend(base + v for v in vals)
    return values, pos


def decode_roaring_bitmap_array(data: bytes) -> list[int]:
    """Serialized 64-bit RoaringBitmapArray -> sorted row indices."""
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != MAGIC:
        raise ValueError(
            f"bad RoaringBitmapArray magic {magic} (want {MAGIC})"
        )
    (n_bitmaps,) = struct.unpack_from("<q", data, 4)
    pos = 12
    out: list[int] = []
    for high in range(n_bitmaps):
        vals, pos = _decode_rb32(data, pos)
        out.extend((high << 32) | v for v in vals)
    return sorted(out)


def _encode_rb32(values: list[int]) -> bytes:
    """One 32-bit bitmap, portable format.  Array containers for small
    cardinalities, bitmap containers above the 4096 threshold — the
    exact shapes the spec's reader must accept."""
    by_key: dict[int, list[int]] = {}
    for v in sorted(set(values)):
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(by_key)
    n = len(keys)
    head = struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, n)
    desc = b"".join(
        struct.pack("<HH", k, len(by_key[k]) - 1) for k in keys
    )
    bodies: list[bytes] = []
    for k in keys:
        vals = by_key[k]
        if len(vals) > _ARRAY_MAX:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            bodies.append(struct.pack("<1024Q", *words))
        else:
            bodies.append(struct.pack(f"<{len(vals)}H", *vals))
    off = len(head) + len(desc) + 4 * n
    offsets = []
    for b in bodies:
        offsets.append(off)
        off += len(b)
    return (
        head
        + desc
        + struct.pack(f"<{n}i", *offsets)
        + b"".join(bodies)
    )


def encode_roaring_bitmap_array(indices) -> bytes:
    """Sorted-or-not row indices -> serialized RoaringBitmapArray
    (the DV ``data`` payload, before length prefix / checksum)."""
    by_high: dict[int, list[int]] = {}
    for i in indices:
        if i < 0:
            raise ValueError(f"negative row index {i}")
        by_high.setdefault(i >> 32, []).append(i & 0xFFFFFFFF)
    n = (max(by_high) + 1) if by_high else 0
    parts = [struct.pack("<iq", MAGIC, n)]
    for high in range(n):
        parts.append(_encode_rb32(by_high.get(high, [])))
    return b"".join(parts)


def dv_file_name(uuid: _uuid.UUID, prefix: str = "") -> str:
    """Spec naming for storageType ``u``: optional random prefix dir,
    then ``deletion_vector_<uuid>.bin``."""
    name = f"deletion_vector_{uuid}.bin"
    return f"{prefix}/{name}" if prefix else name


def write_dv_file(path: str, datas: list[bytes]) -> list[tuple[int, int]]:
    """Write a spec-shaped DV file holding one or more DVs; returns
    [(offset, sizeInBytes)] per DV, for descriptor authoring."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    spans: list[tuple[int, int]] = []
    with open(path, "wb") as f:
        f.write(bytes([FORMAT_VERSION]))
        pos = 1
        for data in datas:
            spans.append((pos, len(data)))
            f.write(struct.pack(">i", len(data)))
            f.write(data)
            f.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
            pos += 4 + len(data) + 4
    return spans


def descriptor_spec(table_root: str, desc: dict) -> tuple:
    """Normalize a ``deletionVector`` descriptor into a picklable
    executor-side spec: ``("inline", data_bytes)`` or
    ``("file", abs_path, offset, size)``.  Raises loudly on unknown
    storage types — never a silent misread."""
    st = desc.get("storageType")
    poi = desc.get("pathOrInlineDv") or ""
    if st == "i":
        return ("inline", z85_decode(poi))
    if st == "u":
        # last 20 chars are the Z85 uuid; anything before is the
        # optional random prefix directory
        if len(poi) < 20:
            raise ValueError(f"DV pathOrInlineDv too short: {poi!r}")
        prefix, enc = poi[:-20], poi[-20:]
        u = _uuid.UUID(bytes=z85_decode(enc))
        rel = dv_file_name(u, prefix)
        return (
            "file",
            os.path.join(table_root, rel),
            desc.get("offset"),
            int(desc["sizeInBytes"]),
        )
    if st == "p":
        return (
            "file",
            poi,
            desc.get("offset"),
            int(desc["sizeInBytes"]),
        )
    raise ValueError(f"unknown DV storageType {st!r}")


def read_spec(spec: tuple) -> bytes:
    """Resolve a ``descriptor_spec`` to the raw bitmap data, verifying
    the length prefix and CRC-32 for file-backed DVs."""
    if spec[0] == "inline":
        return spec[1]
    _, path, offset, size = spec
    with open(path, "rb") as f:
        if offset is None:
            ver = f.read(1)
            if not ver or ver[0] != FORMAT_VERSION:
                raise ValueError(
                    f"unsupported DV file format version in {path}"
                )
        else:
            f.seek(int(offset))
        (stored,) = struct.unpack(">i", f.read(4))
        if stored != size:
            raise ValueError(
                f"DV size mismatch in {path}: descriptor says {size}, "
                f"file says {stored}"
            )
        data = f.read(size)
        (crc,) = struct.unpack(">I", f.read(4))
        actual = zlib.crc32(data) & 0xFFFFFFFF
        if crc != actual:
            raise ValueError(
                f"DV checksum mismatch in {path} at offset {offset}"
            )
        return data


def deleted_rows(spec: tuple) -> list[int]:
    """Spec -> sorted deleted in-file row indices."""
    return decode_roaring_bitmap_array(read_spec(spec))


# --- standard 64-bit "portable" roaring serialization (Iceberg v3) ---
# Iceberg v3 deletion vectors serialize their bitmap in the
# RoaringFormatSpec's 64-bit PORTABLE format (not Delta's
# RoaringBitmapArray wrapper above): an 8-byte little-endian count of
# 32-bit buckets, then per bucket a 4-byte little-endian high key
# followed by the standard 32-bit serialization — the same 32-bit
# container codec both wrappers share (_decode_rb32/_encode_rb32).
# https://github.com/RoaringBitmap/RoaringFormatSpec ("64-bit
# implementations / portable format").


def decode_roaring64_portable(data: bytes) -> list[int]:
    """Portable Roaring64 bytes -> sorted row indices."""
    (n_buckets,) = struct.unpack_from("<q", data, 0)
    pos = 8
    out: list[int] = []
    prev_key = -1
    for _ in range(n_buckets):
        (key,) = struct.unpack_from("<i", data, pos)
        pos += 4
        if key <= prev_key:
            raise ValueError(
                f"portable Roaring64 bucket keys not ascending ({key})"
            )
        prev_key = key
        vals, pos = _decode_rb32(data, pos)
        out.extend((key << 32) | v for v in vals)
    if pos != len(data):
        raise ValueError(
            f"portable Roaring64 trailing bytes ({len(data) - pos})"
        )
    return out


def encode_roaring64_portable(indices) -> bytes:
    """Sorted-or-not row indices -> portable Roaring64 bytes (empty
    buckets are OMITTED, unlike Delta's dense RoaringBitmapArray)."""
    by_high: dict[int, list[int]] = {}
    for i in indices:
        if i < 0:
            raise ValueError(f"negative row index {i}")
        by_high.setdefault(i >> 32, []).append(i & 0xFFFFFFFF)
    parts = [struct.pack("<q", len(by_high))]
    for high in sorted(by_high):
        parts.append(struct.pack("<i", high))
        parts.append(_encode_rb32(by_high[high]))
    return b"".join(parts)
