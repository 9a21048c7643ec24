"""Minimal PUFFIN file support for Iceberg v3 deletion vectors.

Everything here is implemented from PUBLIC specifications only:

* Puffin file format — https://iceberg.apache.org/puffin-spec/:
  ``PFA1`` magic at offset 0, blobs back to back, then the footer:
  magic, FooterPayload (FileMetadata JSON, optionally compressed),
  FooterPayloadSize (4 bytes little-endian), Flags (4 bytes — bit 0 of
  byte 0 = payload compressed), magic.  FileMetadata lists each blob's
  ``type`` / ``offset`` / ``length`` plus Iceberg-assigned fields.
* ``deletion-vector-v1`` blob type — the Iceberg v3 spec ("Deletion
  vectors"): the blob holds a 4-byte BIG-endian length of the magic +
  vector, the 4-byte magic sequence ``D1 D3 39 64``, the vector as a
  64-bit "portable" RoaringBitmap (delta_dv.decode_roaring64_portable
  — position deletes within one data file), and a 4-byte BIG-endian
  CRC-32 of the magic + vector.  The manifest entry addresses the blob
  directly via ``content_offset`` / ``content_size_in_bytes``, so a
  reader never needs the footer — but this writer emits a conformant
  footer anyway so real Puffin readers can open the files.

Scale shape: a DV blob is proportional to ONE data file's deleted rows
(roaring-compressed); reads are a single ``seek`` + bounded read at
the manifest-given offset, executor-side.
"""

from __future__ import annotations

import json
import os
import struct
import zlib

from .delta_dv import decode_roaring64_portable, encode_roaring64_portable

MAGIC = b"PFA1"
DV_MAGIC = bytes([0xD1, 0xD3, 0x39, 0x64])
DV_BLOB_TYPE = "deletion-vector-v1"


def dv_blob_bytes(positions) -> bytes:
    """One ``deletion-vector-v1`` blob: BE length prefix + magic +
    portable Roaring64 vector + BE CRC-32 of (magic + vector)."""
    vec = encode_roaring64_portable(positions)
    body = DV_MAGIC + vec
    return (
        struct.pack(">i", len(body))
        + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    )


def decode_dv_blob(blob: bytes) -> list[int]:
    """Blob bytes -> sorted deleted positions, verifying the length
    prefix, magic and CRC — a corrupt vector must never half-apply."""
    if len(blob) < 12:
        raise ValueError(f"deletion-vector blob too short ({len(blob)})")
    (n,) = struct.unpack_from(">i", blob, 0)
    body = blob[4 : 4 + n]
    if len(body) != n:
        raise ValueError(
            f"deletion-vector blob length prefix {n} exceeds blob"
        )
    if body[:4] != DV_MAGIC:
        raise ValueError(
            f"bad deletion-vector magic {body[:4]!r} (want {DV_MAGIC!r})"
        )
    (crc,) = struct.unpack_from(">I", blob, 4 + n)
    actual = zlib.crc32(body) & 0xFFFFFFFF
    if crc != actual:
        raise ValueError("deletion-vector CRC-32 mismatch")
    return decode_roaring64_portable(body[4:])


def read_dv_blob(path: str, offset: int, size: int) -> list[int]:
    """Seek-and-read one DV blob at the manifest's ``content_offset``/
    ``content_size_in_bytes`` — O(blob bytes), no footer parse."""
    with open(path, "rb") as f:
        f.seek(int(offset))
        blob = f.read(int(size))
    if len(blob) != int(size):
        raise ValueError(
            f"deletion-vector blob truncated in {path} at {offset}"
        )
    return decode_dv_blob(blob)


def write_puffin(
    path: str,
    blobs: list[tuple[bytes, dict]],
    snapshot_id: int = 0,
    sequence_number: int = 0,
) -> list[dict]:
    """Write a conformant Puffin file holding ``blobs`` (raw bytes +
    extra FileMetadata fields, e.g. ``referenced-data-file``).
    ``snapshot_id``/``sequence_number`` stamp each blob's FileMetadata
    with the COMMITTING snapshot's lineage (the spec requires the
    snapshot the blob was computed for) so footer-reading engines see
    the right provenance, not a hardcoded 0.  Returns the per-blob
    metadata dicts (with ``offset``/``length`` filled) for manifest
    authoring."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    metas: list[dict] = []
    with open(path, "wb") as f:
        f.write(MAGIC)
        pos = len(MAGIC)
        for raw, extra in blobs:
            m = {
                "type": DV_BLOB_TYPE,
                "fields": [],
                "snapshot-id": int(snapshot_id),
                "sequence-number": int(sequence_number),
                "offset": pos,
                "length": len(raw),
            }
            m.update(extra or {})
            metas.append(m)
            f.write(raw)
            pos += len(raw)
        payload = json.dumps({"blobs": metas, "properties": {}}).encode()
        f.write(MAGIC)
        f.write(payload)
        f.write(struct.pack("<i", len(payload)))
        f.write(struct.pack("<i", 0))  # flags: uncompressed payload
        f.write(MAGIC)
    return metas
