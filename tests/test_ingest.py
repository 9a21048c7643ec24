"""Unit tests for the ingest helper (fetch/retry/normalize) — no Spark, no
network: the fetcher is injected."""

from __future__ import annotations

import pytest

from rxlan_aws_lakehouse_spark.pipeline.ingest import (
    FetchError,
    get_with_retries,
    ingest_cities,
    normalize_weather_record,
)

PAYLOAD = {
    "id": 123,
    "dt": 1709287500,
    "coord": {"lat": 30.27, "lon": -97.74},
    "main": {"temp": 21.5, "feels_like": 20.9, "humidity": 40, "pressure": 1015},
    "wind": {"speed": 4.2},
    "sys": {"country": "US"},
    "weather": [{"description": "clear sky"}, {"description": "ignored"}],
}


def test_retry_backoff_sequence():
    calls, sleeps = [], []
    def fetch(url, params):
        calls.append(1)
        return (500, None) if len(calls) < 3 else (200, PAYLOAD)
    out = get_with_retries(fetch, "u", {}, retries=2, sleep=sleeps.append)
    assert out == PAYLOAD
    assert len(calls) == 3
    assert sleeps == [0.5, 1.0]  # exponential: 0.5s -> 1s


def test_retry_gives_up_and_4xx_not_retried():
    def always_503(url, params):
        return 503, None
    with pytest.raises(FetchError):
        get_with_retries(always_503, "u", {}, retries=1, sleep=lambda s: None)

    calls = []
    def not_found(url, params):
        calls.append(1)
        return 404, None
    with pytest.raises(FetchError):
        get_with_retries(not_found, "u", {}, retries=2, sleep=lambda s: None)
    assert len(calls) == 1  # 404 is terminal

    # 429 IS retryable
    calls2 = []
    def throttled(url, params):
        calls2.append(1)
        return (429, None) if len(calls2) == 1 else (200, PAYLOAD)
    assert get_with_retries(throttled, "u", {}, retries=1, sleep=lambda s: None) == PAYLOAD


def test_normalize_record():
    rec = normalize_weather_record("Austin,US", PAYLOAD, now_iso="2024-03-01T10:05:00Z")
    assert rec["city"] == "Austin" and rec["country"] == "US"
    assert rec["temp_c"] == 21.5 and rec["humidity"] == 40
    assert rec["conditions"] == "clear sky"  # first array element
    assert rec["raw"] == {"id": 123, "dt": 1709287500}
    assert rec["validation_errors"] == []
    # country falls back to sys.country when the query has no ",CC"
    rec2 = normalize_weather_record("Austin", PAYLOAD)
    assert rec2["country"] == "US"


def test_normalize_annotates_out_of_range():
    bad = dict(PAYLOAD, main={"temp": 99.0, "humidity": 120, "pressure": 0})
    rec = normalize_weather_record("X", bad)
    assert sorted(rec["validation_errors"]) == [
        "humidity_out_of_range",
        "pressure_not_positive",
        "temp_out_of_range",
    ]


def test_ingest_cities_counts_errors_without_failing():
    def fetch(url, params):
        if params["q"] == "Nowhere":
            return 404, None
        return 200, PAYLOAD
    s = ingest_cities(fetch, ["Austin,US", "Nowhere", "Chicago,US"])
    assert (s.cities, s.ok, s.errors) == (3, 2, 1)
    assert len(s.records) == 2


# -- distributed fetch (mapInPandas) -------------------------------------


def test_distributed_ingest_thousand_endpoints(spark):
    """~1000 synthetic endpoints through the mapInPandas fetcher: work
    spreads across partitions, per-endpoint retry accounting rides the
    output rows, failures are data (never job-fatal), and the rate
    limiter + backoff never call real sleep (injected no-op)."""
    from rxlan_aws_lakehouse_spark.pipeline.ingest import (
        ingest_cities_distributed,
    )

    payload = dict(PAYLOAD)  # plain data: serializes by value

    def flaky_factory():
        # per-partition transport: endpoint q ending in 0 or 5 fails its
        # FIRST attempt with 503 then succeeds; 'dead' endpoints always
        # 404. Defined inside the test so cloudpickle ships it by value
        # (executors cannot import the test module).
        seen: set[str] = set()

        def fetch(url, params):
            q = params["q"]
            if "dead" in q:
                return 404, None
            if q.split(",")[0][-1] in "05" and q not in seen:
                seen.add(q)
                return 503, None
            return 200, dict(payload, id=hash(q) % 10_000)

        return fetch

    cities = [f"City{i},US" for i in range(990)] + [
        f"dead{i},US" for i in range(10)
    ]
    out = ingest_cities_distributed(
        spark,
        flaky_factory,
        cities,
        n_partitions=8,
        min_interval=0.001,
        sleep=lambda s: None,  # no real waiting in tests
        now_iso="2026-01-01T00:00:00Z",
    ).collect()
    assert len(out) == 1000
    by_city = {r["city"]: r for r in out}
    # failures are rows, not exceptions; non-retryable 404 = 1 attempt
    dead = [r for r in out if not r["ok"]]
    assert len(dead) == 10
    assert all("status 404" in r["error"] and r["attempts"] == 1 for r in dead)
    # retry accounting: flaky endpoints took exactly 2 attempts
    flaky = [r for r in out if r["ok"] and r["city"][-4] in "05"]
    assert flaky and all(r["attempts"] == 2 for r in flaky)
    ok_clean = [
        r for r in out if r["ok"] and r["city"][-4] not in "05"
    ]
    assert all(r["attempts"] == 1 for r in ok_clean)
    # per-partition concurrency: the work really spread out
    assert len({r["partition_id"] for r in out}) == 8
    # normalized NDJSON payload ready for the bronze writer
    import json as _json

    rec = _json.loads(by_city["City7,US"]["record_json"])
    assert rec["city"] == "City7" and rec["country"] == "US"
    assert rec["fetched_at_utc"] == "2026-01-01T00:00:00Z"


def test_rate_limiter_spacing():
    from rxlan_aws_lakehouse_spark.pipeline.ingest import RateLimiter

    t = [0.0]
    slept: list[float] = []

    def clock():
        return t[0]

    def sleep(s):
        slept.append(s)
        t[0] += s

    rl = RateLimiter(1.0, sleep=sleep, clock=clock)
    rl.wait()          # first call: no wait
    rl.wait()          # immediate second call: waits the full interval
    t[0] += 0.25
    rl.wait()          # 0.25s later: tops up to 1.0
    assert slept == [1.0, 0.75]
    assert rl.waits == 2
    nolimit = RateLimiter(0.0, sleep=sleep, clock=clock)
    nolimit.wait(); nolimit.wait()
    assert rl.waits == 2 and len(slept) == 2  # unlimited never sleeps
