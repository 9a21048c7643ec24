"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real image/audio decode libraries are not available in this environment, so
the decode step is a clearly-marked deterministic stand-in — but everything
Spark-side is real and scale-shaped: binary columns travel as `binary` with
typed metadata structs, and feature extraction runs as an Arrow-batched
`mapInPandas` over partitions (the exact plumbing a real decoder would use:
batch in, batch out, no row-at-a-time Python).

At 100 TB: binary payloads stay columnar in parquet; `mapInPandas` processes
Arrow record batches so the Python boundary is amortized over thousands of
rows; partition sizing (`spark.sql.files.maxPartitionBytes`) bounds executor
memory per batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 4

FEATURES_SCHEMA = (
    "doc_id long, modality string, n_bytes int, feature array<double>"
)


def to_binary_payload(df: DataFrame, id_col: str, text_col: str, modality: str = "text") -> DataFrame:
    """Model a source column as an opaque binary payload + metadata struct —
    the storage shape image/audio/video columns use."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit(modality).alias("modality"),
        F.octet_length(F.col(text_col)).alias("n_bytes"),
        F.lit("utf-8").alias("encoding"),
    )
    return df.select(F.col(id_col).alias("doc_id"), payload.alias("payload"), meta.alias("meta"))


def _fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder (e.g. image -> CNN features).

    A real implementation would decode `payload` with PIL/librosa/av and run a
    feature extractor; those libraries are unavailable here by design. The
    stand-in derives FEATURE_DIM moments from the raw bytes so the pipeline
    shape (binary in, fixed-width float vector out) is faithfully exercised.
    """
    if not payload:
        return [0.0] * FEATURE_DIM
    n = len(payload)
    s = sum(payload)
    mx = max(payload)
    mn = min(payload)
    return [float(n), s / n, float(mx), float(mn)]


def encode_bmp(width: int, height: int, pixel_fn) -> bytes:
    """Serialize a real, spec-conformant 24-bit uncompressed BMP:
    BITMAPFILEHEADER + BITMAPINFOHEADER, scanlines bottom-up in BGR order,
    each row zero-padded to a 4-byte boundary. ``pixel_fn(x, y)`` returns
    the (r, g, b) of the TOP-DOWN pixel grid. Any BMP viewer opens the
    output; ``decode_real`` round-trips it exactly."""
    import struct

    row_stride = (width * 3 + 3) & ~3
    pixel_bytes = row_stride * height
    off = 14 + 40
    out = bytearray()
    out += struct.pack("<2sIHHI", b"BM", off + pixel_bytes, 0, 0, off)
    out += struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, pixel_bytes,
        2835, 2835, 0, 0,
    )
    for y in range(height - 1, -1, -1):  # bottom-up storage
        row = bytearray()
        for x in range(width):
            r, g, b = pixel_fn(x, y)
            row += bytes((b & 0xFF, g & 0xFF, r & 0xFF))  # BGR on disk
        row += b"\x00" * (row_stride - len(row))
        out += row
    return bytes(out)


def decode_real(payload: bytes, modality: str) -> dict:
    """Real decode for the formats this environment can parse without
    media libraries: 24-bit uncompressed BMP (pure header+scanline
    parsing). Returns ``{"format", "width", "height", "pixels"}`` with
    ``pixels`` the top-down row-major (r, g, b) tuples — padding stripped,
    bottom-up storage unflipped, BGR swapped back. Other containers raise
    ``ValueError`` (undecodable input, the error a real decoder gives),
    so the pipeline's bad-payload handling is exercised for real."""
    import struct

    if modality != "image" or len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError(
            f"undecodable {modality} payload: not a BMP container"
        )
    off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, width, height = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant: bpp={bpp} compression={compression}"
        )
    if width <= 0 or height == 0:
        # zero-area (or negative-width) images are malformed: raise the
        # documented bad-payload error instead of returning an empty
        # pixel grid that downstream means would divide by
        raise ValueError(f"degenerate BMP dimensions: {width}x{height}")
    bottom_up = height > 0
    height = abs(height)
    row_stride = (width * 3 + 3) & ~3
    if off + row_stride * height > len(payload):
        raise ValueError("truncated BMP pixel array")
    pixels: list[tuple[int, int, int]] = []
    for y in range(height):
        src_y = (height - 1 - y) if bottom_up else y
        base = off + src_y * row_stride
        for x in range(width):
            b, g, r = payload[base + 3 * x : base + 3 * x + 3]
            pixels.append((r, g, b))
    return {
        "format": "bmp",
        "width": width,
        "height": height,
        "pixels": pixels,
    }


DECODED_SCHEMA = (
    "doc_id long, fmt string, width int, height int, "
    "mean_r double, mean_g double, mean_b double"
)


def make_bmp_payloads(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Arrow-batched synthesis of REAL image payloads: each row becomes a
    spec-conformant 24-bit BMP whose dimensions and pixel values derive
    deterministically from (id, len(text)) — the ingest-side twin of
    ``decode_features``. The generation rule is simple enough to restate
    in SQL, which is what lets a DuckDB oracle hash-check the DECODED
    output end to end: an encoder or decoder bug (padding, bottom-up
    order, BGR swap) shifts the decoded channel means and the hash."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for i, n in zip(pdf[id_col], pdf[text_col].str.len()):
                i, n = int(i), int(n)
                w, h = 4 + i % 5, 3 + i % 3
                payloads.append(
                    encode_bmp(
                        w,
                        h,
                        lambda x, y, i=i, n=n: (
                            (i * 7 + y) % 256,
                            (x * 13 + i) % 256,
                            n % 256,
                        ),
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": payloads,
                    "modality": "image",
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        batches, schema="doc_id long, payload binary, modality string"
    )


def decode_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode: parse each payload with ``decode_real``
    and reduce the pixel grid to per-channel means — the decode → feature
    step of an image pipeline with an actual (pure-Python) codec doing
    the decoding. Same batch shape as ``extract_features``; swapping in
    PIL/libav means replacing ``decode_real`` only."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload, modality in zip(
                pdf["doc_id"], pdf["payload"], pdf["modality"]
            ):
                img = decode_real(bytes(payload), str(modality))
                px = img["pixels"]
                n = len(px)
                rows.append(
                    (
                        int(doc_id),
                        img["format"],
                        img["width"],
                        img["height"],
                        sum(p[0] for p in px) / n,
                        sum(p[1] for p in px) / n,
                        sum(p[2] for p in px) / n,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "fmt", "width", "height",
                    "mean_r", "mean_g", "mean_b",
                ],
            )

    return binary_df.mapInPandas(batches, schema=DECODED_SCHEMA)


FRAME_BYTES = 64
MAX_FRAMES = 8


def sample_frames(
    binary_df: DataFrame,
    frame_bytes: int = FRAME_BYTES,
    max_frames: int = MAX_FRAMES,
) -> DataFrame:
    """Frame sampling over an opaque binary payload — the video-pipeline
    step (decode container -> pick every k-th frame -> per-frame features)
    with the codec stubbed: frames are fixed-width byte slices, the sample
    stride adapts so at most ``max_frames`` frames emerge per payload.

    Everything runs as scan-side column expressions (sequence + explode +
    binary substring), so frame fan-out never shuffles: at 100 TB the
    sampled frames flow straight into the per-frame feature extractor in
    the same stage as the read. Payloads shorter than one frame produce no
    rows (a real sampler skips undecodable clips the same way).
    """
    n_frames = F.floor(F.octet_length("payload") / F.lit(frame_bytes))
    # ceil stride guarantees ceil(n/stride) <= max_frames sampled frames
    stride = F.greatest(
        F.lit(1), F.ceil(n_frames / F.lit(max_frames))
    ).cast("int")
    idx = F.when(
        n_frames > 0,
        F.sequence(F.lit(0), (n_frames - 1).cast("int"), stride),
    ).otherwise(F.array().cast("array<int>"))
    slice_ = F.substring(
        F.col("payload"),
        (F.col("frame_idx") * frame_bytes + 1).cast("int"),
        frame_bytes,
    )
    return (
        binary_df.select(
            "doc_id",
            F.col("meta.modality").alias("modality"),
            "payload",
            F.explode(idx).alias("frame_idx"),
        )
        .select(
            "doc_id",
            "modality",
            "frame_idx",
            F.octet_length(slice_).alias("frame_bytes"),
            # md5 over the hex rendering: both engines agree on hex(blob)
            # (uppercase) and md5(varchar), so the frame CONTENT is pinned
            # without hauling raw bytes through the comparator
            F.md5(F.hex(slice_)).alias("frame_md5"),
        )
    )


def extract_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via mapInPandas."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "n_bytes": [int(m["n_bytes"]) for m in pdf["meta"]],
                    "feature": [ _fake_decode_features(p) for p in pdf["payload"] ],
                }
            )

    return binary_df.mapInPandas(batches, schema=FEATURES_SCHEMA)
