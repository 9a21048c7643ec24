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


# -- real audio codec: RIFF/WAVE 16-bit PCM (round 8) ---------------------

def encode_wav(sample_rate: int, n_channels: int, samples: list[int]) -> bytes:
    """Serialize a real, spec-conformant RIFF/WAVE file: PCM format tag,
    16-bit little-endian signed samples, ``samples`` already interleaved
    (frame-major: L R L R ... for stereo). Any audio player opens the
    output; ``decode_wav`` round-trips it exactly. Second REAL container
    beside BMP — proves the decode seam isn't image-shaped."""
    import struct

    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, n_channels * 2, 16
    )
    out = bytearray()
    out += b"RIFF"
    out += struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
    out += b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return bytes(out)


def decode_wav(payload: bytes, modality: str = "audio") -> dict:
    """Real RIFF/WAVE decode without media libraries: container header,
    even-padded chunk walk (unknown chunks — LIST, fact, cue — are
    skipped, as a real parser must), PCM/16-bit validation, interleaved
    int16 sample parse. Returns ``{"format", "sample_rate", "n_channels",
    "n_frames", "samples"}`` with ``samples`` the flat interleaved signed
    ints. Non-RIFF, non-PCM, or truncated payloads raise ``ValueError``
    (the error a real decoder gives), so bad-payload handling is
    exercised for real."""
    import struct

    if modality != "audio" or len(payload) < 12 or payload[:4] != b"RIFF":
        raise ValueError(f"undecodable {modality} payload: not a RIFF container")
    if payload[8:12] != b"WAVE":
        raise ValueError("RIFF container is not WAVE")
    pos, fmt_chunk, data_chunk = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            fmt_chunk = body
        elif cid == b"data":
            data_chunk = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if fmt_chunk is None or data_chunk is None:
        raise ValueError("missing fmt/data chunk")
    if len(fmt_chunk) < 16:
        raise ValueError("short fmt chunk")
    audio_fmt, n_channels, sample_rate, _br, block_align, bits = (
        struct.unpack_from("<HHIIHH", fmt_chunk, 0)
    )
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"unsupported WAV variant: fmt={audio_fmt} bits={bits}")
    if n_channels < 1 or block_align != n_channels * 2:
        raise ValueError(f"malformed fmt: channels={n_channels} align={block_align}")
    if len(data_chunk) % block_align:
        raise ValueError("data chunk not frame-aligned")
    n = len(data_chunk) // 2
    samples = list(struct.unpack(f"<{n}h", data_chunk))
    return {
        "format": "wav",
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "n_frames": n // n_channels,
        "samples": samples,
    }


def make_wav_payloads(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Arrow-batched synthesis of REAL audio payloads: each row becomes a
    spec-conformant 16-bit PCM WAV whose rate/channels/length/amplitudes
    derive deterministically from (id, len(text)):
        n_frames = 20 + id % 13, channels = 1 + id % 2 (mono AND stereo),
        rate = 8000 + 100 * (id % 5),
        amp(t, c) = ((id*31 + t*17 + c*7 + len) % 2003) - 1001
    Signed amplitudes exercise the int16 two's-complement round trip; the
    rule restates in SQL, so a DuckDB oracle hash-checks the DECODED
    stats end to end (an interleave / endianness / sign bug shifts them)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for i, n in zip(pdf[id_col], pdf[text_col].str.len()):
                i, n = int(i), int(n)
                nf, nc = 20 + i % 13, 1 + i % 2
                rate = 8000 + 100 * (i % 5)
                samples = [
                    ((i * 31 + t * 17 + c * 7 + n) % 2003) - 1001
                    for t in range(nf)
                    for c in range(nc)
                ]
                payloads.append(encode_wav(rate, nc, samples))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": payloads,
                    "modality": "audio",
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        batches, schema="doc_id long, payload binary, modality string"
    )


AUDIO_SCHEMA = (
    "doc_id long, fmt string, sample_rate int, n_channels int, "
    "n_frames int, mean_amp double, peak int, rms double"
)


def decode_audio_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched REAL audio decode: parse each payload with
    ``decode_wav`` and reduce the samples to mean / peak(|x|) / RMS — the
    decode → feature step of an audio pipeline with an actual pure-Python
    codec. Same batch shape as ``decode_features`` (images); swapping in
    librosa/soundfile means replacing ``decode_wav`` only."""
    import math

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload, modality in zip(
                pdf["doc_id"], pdf["payload"], pdf["modality"]
            ):
                wav = decode_wav(bytes(payload), str(modality))
                s = wav["samples"]
                n = len(s)
                rows.append(
                    (
                        int(doc_id),
                        wav["format"],
                        wav["sample_rate"],
                        wav["n_channels"],
                        wav["n_frames"],
                        sum(s) / n,
                        max(abs(v) for v in s),
                        math.sqrt(sum(v * v for v in s) / n),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "fmt", "sample_rate", "n_channels",
                    "n_frames", "mean_amp", "peak", "rms",
                ],
            )

    return binary_df.mapInPandas(batches, schema=AUDIO_SCHEMA)
