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
