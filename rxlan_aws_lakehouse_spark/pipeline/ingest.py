"""Ingest: REST fetch -> normalized flat record -> bronze NDJSON line.

Re-expresses the reference's ingest Lambda
(/root/reference/lambda/ingest_weather/handler.py) as a plain-Python helper
(it is driver-side I/O, not a Spark operator — SURVEY.md §2.1 S1/S2). The
HTTP layer is injectable so tests (and this network-less environment) pass a
fake fetcher; retry/backoff semantics match the reference: up to
``retries`` extra attempts on 5xx/429/network errors, exponential backoff
starting at ``base_backoff`` (handler.py:31-53).

The row-level normalizer is intentionally duplicated as DataFrame column
expressions in silver.py (SURVEY.md §2.10: no UDF for it); this Python copy
exists only for the pre-Spark landing path.
"""

from __future__ import annotations

import gzip
import json
import os
import time
import uuid
from collections.abc import Callable
from dataclasses import dataclass, field
from datetime import datetime, timezone

# response shape: (status_code, payload dict or None)
FetchFn = Callable[[str, dict], tuple[int, dict | None]]


class FetchError(Exception):
    pass


def get_with_retries(
    fetch: FetchFn,
    url: str,
    params: dict,
    retries: int = 2,
    base_backoff: float = 0.5,
    sleep: Callable[[float], None] = time.sleep,
) -> dict:
    """Retry on 5xx/429/exception with 0.5s -> 1s -> 2s backoff
    (handler.py:31-53 semantics)."""
    attempts = retries + 1
    last = None
    for i in range(attempts):
        try:
            status, payload = fetch(url, params)
        except Exception as e:  # network error
            last = f"network error: {e}"
            status, payload = None, None
        else:
            if status == 200 and payload is not None:
                return payload
            last = f"status {status}"
            if status is not None and not (status >= 500 or status == 429):
                break  # non-retryable 4xx
        if i < attempts - 1:
            sleep(base_backoff * (2**i))
    raise FetchError(f"fetch failed after {attempts} attempts: {last}")


def utcnow_iso() -> str:
    return datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


def normalize_weather_record(city_q: str, payload: dict, now_iso: str | None = None) -> dict:
    """Flatten a nested source payload to the ingest contract
    (docs/ingest_payload.md:8-26; handler.py:56-102).

    Splits "City,CC", navigates nested dicts with defaults, takes the first
    element of the weather array, and annotates range violations in
    ``validation_errors`` without dropping the record.
    """
    fetched = now_iso or utcnow_iso()
    parts = city_q.split(",", 1)
    city = parts[0].strip()
    country_from_q = parts[1].strip() if len(parts) > 1 else ""
    main = payload.get("main") or {}
    wind = payload.get("wind") or {}
    coord = payload.get("coord") or {}
    sys_ = payload.get("sys") or {}
    weather_list = payload.get("weather") or []
    first_weather = weather_list[0] if weather_list else {}

    rec = {
        "app": "rxlan",
        "stage": os.environ.get("STAGE", "dev"),
        "source": "openweather",
        "fetched_at_utc": fetched,
        "city": city,
        "country": country_from_q or sys_.get("country", ""),
        "lat": coord.get("lat"),
        "lon": coord.get("lon"),
        "temp_c": main.get("temp"),
        "feels_like_c": main.get("feels_like"),
        "humidity": main.get("humidity"),
        "pressure": main.get("pressure"),
        "wind_speed": wind.get("speed"),
        "conditions": str(first_weather.get("description", ""))[:200],
        "raw": {"id": payload.get("id"), "dt": payload.get("dt")},
    }

    errors = []
    t = rec["temp_c"]
    if t is not None and not (-90 <= t <= 60):
        errors.append("temp_out_of_range")
    h = rec["humidity"]
    if h is not None and not (0 <= h <= 100):
        errors.append("humidity_out_of_range")
    p = rec["pressure"]
    if p is not None and p <= 0:
        errors.append("pressure_not_positive")
    rec["validation_errors"] = errors
    return rec


@dataclass
class IngestSummary:
    cities: int = 0
    ok: int = 0
    errors: int = 0
    records: list[dict] = field(default_factory=list)


def ingest_cities(
    fetch: FetchFn,
    cities: list[str],
    url: str = "https://api.openweathermap.org/data/2.5/weather",
    api_key: str = "",
    now_iso: str | None = None,
) -> IngestSummary:
    """Fetch + normalize each city; errors are counted, not fatal
    (handler.py:105-137)."""
    out = IngestSummary(cities=len(cities))
    for q in cities:
        try:
            payload = get_with_retries(fetch, url, {"q": q, "appid": api_key, "units": "metric"})
        except FetchError:
            out.errors += 1
            continue
        out.records.append(normalize_weather_record(q, payload, now_iso=now_iso))
        out.ok += 1
    return out


class RateLimiter:
    """Per-worker request throttle: enforce ``min_interval`` seconds
    between calls. Driver-testable in isolation; each fetch partition
    owns one instance, so the FLEET rate scales with partitions — the
    knob a polite crawler tunes (requests/s = partitions / interval)."""

    def __init__(
        self,
        min_interval: float,
        sleep: Callable[[float], None] = time.sleep,
        clock: Callable[[], float] = time.monotonic,
    ):
        self.min_interval = min_interval
        self.sleep = sleep
        self.clock = clock
        self._last: float | None = None
        self.waits = 0

    def wait(self) -> None:
        if self.min_interval <= 0:
            return
        now = self.clock()
        if self._last is not None:
            due = self._last + self.min_interval
            if now < due:
                self.waits += 1
                self.sleep(due - now)
                now = self.clock()
        self._last = now


INGEST_DIST_SCHEMA = (
    "city string, ok boolean, attempts int, error string, "
    "partition_id int, record_json string"
)


def ingest_cities_distributed(
    spark,
    fetch_factory: Callable[[], FetchFn],
    cities: list[str],
    url: str = "https://api.openweathermap.org/data/2.5/weather",
    api_key: str = "",
    now_iso: str | None = None,
    n_partitions: int = 8,
    min_interval: float = 0.0,
    retries: int = 2,
    base_backoff: float = 0.5,
    sleep: Callable[[float], None] = time.sleep,
):
    """The scale shape of S1/S2: the endpoint list becomes a DataFrame,
    fetches run INSIDE an Arrow-batched ``mapInPandas`` — per-partition
    transport (``fetch_factory`` builds one connection/session per
    partition, never serialized from the driver), per-partition rate
    limiting, and the same retry/backoff policy as ``get_with_retries``.
    The driver-side ``ingest_cities`` loop is right for the reference's 8
    cities (handler.py:105-137); a crawl of 10^6 endpoints needs this —
    work distributed, failures as DATA (``ok``/``error`` columns, a
    failed endpoint never kills the job), retry accounting riding each
    row so the fleet's behavior is auditable from the output table alone.

    Returns a DataFrame: one row per endpoint with ``ok``, ``attempts``,
    ``error``, the executing ``partition_id``, and the normalized record
    as an NDJSON string (``record_json``, NULL on failure) ready for the
    bronze writer."""
    import pandas as pd

    cities_df = spark.createDataFrame(
        [(c,) for c in cities], "city string"
    ).repartition(n_partitions)

    def run(batches):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        fetch = fetch_factory()  # one transport per partition
        limiter = RateLimiter(min_interval, sleep=sleep)
        for pdf in batches:
            rows = []
            for q in pdf["city"]:
                attempts = 0

                def counting(u: str, params: dict, _q=q):
                    nonlocal attempts
                    attempts += 1
                    limiter.wait()
                    return fetch(u, params)

                try:
                    payload = get_with_retries(
                        counting,
                        url,
                        {"q": q, "appid": api_key, "units": "metric"},
                        retries=retries,
                        base_backoff=base_backoff,
                        sleep=sleep,
                    )
                    rec = normalize_weather_record(
                        q, payload, now_iso=now_iso
                    )
                    rows.append(
                        (
                            q, True, attempts, None, pid,
                            json.dumps(rec, separators=(",", ":")),
                        )
                    )
                except FetchError as e:
                    rows.append((q, False, attempts, str(e), pid, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "city", "ok", "attempts", "error",
                    "partition_id", "record_json",
                ],
            )

    return cities_df.mapInPandas(run, schema=INGEST_DIST_SCHEMA)


def write_ndjson_gz(records: list[dict], directory: str, dt: str, hour: str) -> str:
    """Land records as one gzip NDJSON part file under dt=/hour= —
    the Firehose buffer-flush shape (README.md:147-154)."""
    part_dir = os.path.join(directory, f"dt={dt}", f"hour={hour}")
    os.makedirs(part_dir, exist_ok=True)
    path = os.path.join(part_dir, f"part-{uuid.uuid4().hex}.json.gz")
    with gzip.open(path, "wt", encoding="utf-8") as f:
        for rec in records:
            f.write(json.dumps(rec, separators=(",", ":")) + "\n")
    return path
