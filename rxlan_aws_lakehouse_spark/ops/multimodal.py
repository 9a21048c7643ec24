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


def decode_real(payload: bytes, modality: str):  # pragma: no cover - stub
    """Placeholder for real decode; kept separate so swapping in a real
    decoder touches exactly one function."""
    raise NotImplementedError(
        f"real {modality} decoding requires media libraries not present in this environment"
    )


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
