"""Capstone e2e: the complete reference workflow on OUR engine.

Ingest (fake HTTP) -> bronze landing (gzip NDJSON dt=/hour=) -> batch ETL ->
gold -> every verification query the reference runs against its warehouse
(init.sql:19-55, README.md:196-211), answered over the engine's own gold
table with known expected answers.

This is the test a reference user would run to confirm they can switch:
their full pipeline plus their full analytics SQL, end to end.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.pipeline import run_batch
from rxlan_aws_lakehouse_spark.pipeline.gold import load_gold
from rxlan_aws_lakehouse_spark.pipeline.ingest import (
    ingest_cities,
    write_ndjson_gz,
)

PAYLOADS = {
    "Austin,US": {
        "id": 1,
        "dt": 1709287500,
        "coord": {"lat": 30.27, "lon": -97.74},
        "main": {"temp": 21.5, "feels_like": 20.9, "humidity": 40, "pressure": 1015},
        "wind": {"speed": 4.2},
        "sys": {"country": "US"},
        "weather": [{"description": "clear sky"}],
    },
    "Chicago,US": {
        "id": 2,
        "dt": 1709287510,
        "coord": {"lat": 41.88, "lon": -87.63},
        "main": {"temp": 3.0, "feels_like": -1.0, "humidity": 70, "pressure": 998},
        "wind": {"speed": 9.9},
        "sys": {"country": "US"},
        "weather": [{"description": "snow"}],
    },
}


@pytest.fixture(scope="module")
def gold(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refwf")
    bronze, gold_path = str(tmp / "bronze"), str(tmp / "gold")

    def fetch(url, params):
        return 200, PAYLOADS[params["q"]]

    # hour 10: both cities, plus a DUPLICATE Austin record (at-least-once)
    s1 = ingest_cities(fetch, list(PAYLOADS), now_iso="2024-03-01T10:05:00Z")
    dup = ingest_cities(fetch, ["Austin,US"], now_iso="2024-03-01T10:05:00Z")
    write_ndjson_gz(s1.records + dup.records, bronze, "2024-03-01", "10")
    # hour 11: one more Austin reading
    s2 = ingest_cities(fetch, ["Austin,US"], now_iso="2024-03-01T11:20:00Z")
    write_ndjson_gz(s2.records, bronze, "2024-03-01", "11")

    run_batch(spark, bronze, gold_path)
    df = load_gold(spark, gold_path)
    df.createOrReplaceTempView("weather")
    return df


def test_row_count(spark, gold):
    # init.sql:23 — 4 loaded rows (3 + duplicate; dupes are expected input)
    assert spark.sql("SELECT count(*) AS n FROM weather").head()["n"] == 4


def test_latest_rows(spark, gold):
    # init.sql:25-28 — newest reading first
    top = spark.sql(
        "SELECT city, ts FROM weather ORDER BY ts DESC, city LIMIT 1"
    ).head()
    assert top["city"] == "Austin" and str(top["ts"]) == "2024-03-01 11:20:00"


def test_dup_detection(spark, gold):
    # init.sql:46-52 — the duplicated (city, ts) pair surfaces
    dups = spark.sql(
        """SELECT city, ts, count(*) AS c FROM weather
           GROUP BY city, ts HAVING count(*) > 1
           ORDER BY c DESC, city"""
    ).collect()
    assert len(dups) == 1
    assert dups[0]["city"] == "Austin" and dups[0]["c"] == 2


def test_null_profile_and_fully_null_probe(spark, gold):
    # init.sql:30-44 — clean fixture: zero nulls, zero fully-null rows
    probe = spark.sql(
        """SELECT
             sum(CASE WHEN temp_c IS NULL THEN 1 ELSE 0 END) AS n_temp_null,
             sum(CASE WHEN temp_c IS NULL AND humidity IS NULL
                       AND pressure IS NULL THEN 1 ELSE 0 END) AS n_fully_null
           FROM weather"""
    ).head()
    assert probe["n_temp_null"] == 0 and probe["n_fully_null"] == 0


def test_last_hour_reconciliation(spark, gold):
    # README.md:203-211 — rows per (dt, hour) with max load time
    rows = {
        (r["dt"], r["hour"]): r["n"]
        for r in spark.sql(
            """SELECT dt, hour, count(*) AS n, max(loaded_at) AS max_loaded
               FROM weather GROUP BY dt, hour"""
        ).collect()
    }
    assert rows == {("2024-03-01", "10"): 3, ("2024-03-01", "11"): 1}


def test_typed_contract_columns(gold):
    schema = dict(gold.dtypes)
    assert schema["temp_c"] == "double"
    assert schema["humidity"] == "int"
    assert schema["ts"] == "timestamp"
    assert schema["loaded_at"] == "timestamp"
    row = gold.filter(
        (F.col("city") == "Chicago") & (F.col("hour") == "10")
    ).head()
    assert row["temp_c"] == 3.0 and row["pressure"] == 998
    assert row["country"] == "US"
