"""Structured Streaming surface: the reference's CDC fan-out path
(DynamoDB Streams -> Lambda -> Kinesis -> Firehose -> S3) re-expressed as
one streaming query (SURVEY.md §2.9, §7 M4)."""

from .cdc import cdc_transform, DDB_EVENT_SCHEMA, forward_cdc, windowed_counts
from .windows import session_windows, stream_static_enrich, stream_stream_join

__all__ = [
    "DDB_EVENT_SCHEMA",
    "cdc_transform",
    "forward_cdc",
    "session_windows",
    "stream_static_enrich",
    "stream_stream_join",
    "windowed_counts",
]
