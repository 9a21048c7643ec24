"""End-to-end batch pipeline tests: synthetic bronze NDJSON.gz -> gold.

Mirrors the reference's operational verification queries (init.sql:19-55)
against known-answer fixtures.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.pipeline import run_batch
from rxlan_aws_lakehouse_spark.pipeline.bronze import read_bronze
from rxlan_aws_lakehouse_spark.pipeline.gold import load_gold
from rxlan_aws_lakehouse_spark.pipeline.ingest import write_ndjson_gz
from rxlan_aws_lakehouse_spark.pipeline.schema import GOLD_COLUMNS


def _rec(city, iso_ts, temp=20.0, humidity=50, pressure=1013, **extra):
    base = {
        "app": "rxlan",
        "stage": "dev",
        "source": "openweather",
        "fetched_at_utc": iso_ts,
        "city": city,
        "country": "US",
        "lat": "30.27",
        "lon": "-97.74",
        "temp_c": str(temp),
        "feels_like_c": str(temp - 1.0),
        "humidity": str(humidity),
        "pressure": str(pressure),
        "wind_speed": "3.5",
        "raw": {"id": 1, "dt": 1700000000},
    }
    base.update(extra)
    return base


def _land(bronze, recs_by_hour):
    for (dt, hour), recs in recs_by_hour.items():
        write_ndjson_gz(recs, bronze, dt, hour)


def test_batch_end_to_end(spark, tmp_path):
    bronze = str(tmp_path / "bronze")
    gold = str(tmp_path / "gold")
    _land(
        bronze,
        {
            ("2024-03-01", "10"): [
                _rec("Austin", "2024-03-01T10:05:00Z"),
                _rec("Chicago", "2024-03-01T10:10:00Z"),
                _rec("BadTown", "2024-03-01T10:20:00Z", temp=99.0),  # quarantined
            ],
            ("2024-03-01", "11"): [_rec("Austin", "2024-03-01T11:05:00Z")],
        },
    )
    m = run_batch(spark, bronze, gold)
    assert (m.input_rows, m.good_rows, m.quarantined_rows) == (4, 3, 1)

    out = load_gold(spark, gold)
    assert sorted(out.columns) == sorted(GOLD_COLUMNS)
    rows = {(r["city"], r["hour"]) for r in out.collect()}
    assert rows == {("Austin", "10"), ("Chicago", "10"), ("Austin", "11")}
    # typed columns survived the cast
    schema = dict(out.dtypes)
    assert schema["temp_c"] == "double" and schema["humidity"] == "int"
    assert schema["ts"] == "timestamp"


def test_partition_pruned_run_and_idempotent_reload(spark, tmp_path):
    bronze = str(tmp_path / "bronze")
    gold = str(tmp_path / "gold")
    _land(
        bronze,
        {
            ("2024-03-01", "10"): [_rec("Austin", "2024-03-01T10:05:00Z")],
            ("2024-03-01", "11"): [_rec("Chicago", "2024-03-01T11:05:00Z")],
        },
    )
    # hour-scoped run loads ONLY hour 10
    m = run_batch(spark, bronze, gold, dt="2024-03-01", hour="10")
    assert m.input_rows == 1
    assert {r["hour"] for r in load_gold(spark, gold).collect()} == {"10"}

    # partition filter reaches the file source (prunes at listing time)
    pruned = read_bronze(spark, bronze, dt="2024-03-01", hour="10")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan

    # re-running the same hour must not duplicate (dynamic overwrite, T7)
    run_batch(spark, bronze, gold, dt="2024-03-01", hour="10")
    run_batch(spark, bronze, gold, dt="2024-03-01", hour="11")
    out = load_gold(spark, gold)
    assert out.count() == 2
    assert out.filter(F.col("hour") == "10").count() == 1


def test_empty_slice_is_noop(spark, tmp_path):
    """Gate-1 parity (bronze_to_silver:63-67): an empty input slice must
    report zero counts and leave existing gold partitions untouched."""
    bronze = str(tmp_path / "bronze")
    gold = str(tmp_path / "gold")
    _land(bronze, {("2024-03-01", "10"): [_rec("Austin", "2024-03-01T10:05:00Z")]})
    run_batch(spark, bronze, gold)
    assert load_gold(spark, gold).count() == 1

    # dt filter that matches nothing
    m = run_batch(spark, bronze, gold, dt="2024-03-01", hour="23")
    assert (m.input_rows, m.good_rows, m.quarantined_rows) == (0, 0, 0)
    assert load_gold(spark, gold).count() == 1  # prior data intact


def test_missing_contract_columns_become_typed_nulls(spark, tmp_path):
    bronze = str(tmp_path / "bronze")
    gold = str(tmp_path / "gold")
    rec = _rec("Austin", "2024-03-01T10:05:00Z")
    for k in ("wind_speed", "lat", "lon"):
        rec.pop(k)
    _land(bronze, {("2024-03-01", "10"): [rec]})
    run_batch(spark, bronze, gold)
    row = load_gold(spark, gold).head()
    assert row["wind_speed"] is None and row["lat"] is None
    assert row["city"] == "Austin"


def test_payload_string_column_expansion(spark, tmp_path):
    """F14/F15/F18: bronze rows whose body is a JSON string `payload` column."""
    import gzip
    import os

    bronze = str(tmp_path / "bronze")
    gold = str(tmp_path / "gold")
    part = os.path.join(bronze, "dt=2024-03-01", "hour=10")
    os.makedirs(part)
    inner = _rec("Austin", "2024-03-01T10:05:00Z")
    inner.pop("raw")
    with gzip.open(os.path.join(part, "part-0.json.gz"), "wt") as f:
        f.write(json.dumps({"payload": json.dumps(inner)}) + "\n")

    m = run_batch(spark, bronze, gold, infer=True)
    assert m.good_rows == 1
    row = load_gold(spark, gold).head()
    assert row["city"] == "Austin" and row["temp_c"] == 20.0


def test_corrupt_ndjson_lines_quarantined(spark, tmp_path):
    """Malformed NDJSON lines must not fail the batch or silently vanish:
    they land in quarantine/corrupt, good lines still load."""
    import gzip
    import os

    bronze = str(tmp_path / "bronze")
    gold = str(tmp_path / "gold")
    quarantine = str(tmp_path / "q")
    part = os.path.join(bronze, "dt=2024-03-01", "hour=10")
    os.makedirs(part)
    with gzip.open(os.path.join(part, "part-0.json.gz"), "wt") as f:
        f.write(json.dumps(_rec("Austin", "2024-03-01T10:05:00Z")) + "\n")
        f.write("{this is not json\n")
        f.write(json.dumps(_rec("Chicago", "2024-03-01T10:06:00Z")) + "\n")

    m = run_batch(spark, bronze, gold, quarantine_path=quarantine)
    assert m.good_rows == 2
    out = load_gold(spark, gold)
    assert {r["city"] for r in out.collect()} == {"Austin", "Chicago"}
    corrupt = spark.read.json(f"{quarantine}/corrupt")
    rows = corrupt.collect()
    assert len(rows) == 1
    assert "not json" in rows[0]["corrupt_line"]
    assert rows[0]["dt"] == "2024-03-01"


def test_payload_inference_merges_heterogeneous_rows(spark, tmp_path):
    """F15: schema inference must merge across the sample — a field present
    only in LATER rows (wind_speed here) must still expand."""
    import gzip
    import os

    bronze = str(tmp_path / "bronze")
    gold = str(tmp_path / "gold")
    part = os.path.join(bronze, "dt=2024-03-01", "hour=10")
    os.makedirs(part)
    r1 = _rec("Austin", "2024-03-01T10:05:00Z")
    r1.pop("raw"); r1.pop("wind_speed")  # first row LACKS wind_speed
    r2 = _rec("Chicago", "2024-03-01T10:06:00Z", wind_speed="8.8")
    r2.pop("raw")
    with gzip.open(os.path.join(part, "part-0.json.gz"), "wt") as f:
        f.write(json.dumps({"payload": json.dumps(r1)}) + "\n")
        f.write(json.dumps({"payload": json.dumps(r2)}) + "\n")

    m = run_batch(spark, bronze, gold, infer=True)
    assert m.good_rows == 2
    rows = {r["city"]: r for r in load_gold(spark, gold).collect()}
    assert rows["Austin"]["wind_speed"] is None
    assert rows["Chicago"]["wind_speed"] == 8.8


def test_quarantine_written(spark, tmp_path):
    bronze = str(tmp_path / "bronze")
    gold = str(tmp_path / "gold")
    quarantine = str(tmp_path / "quarantine")
    _land(
        bronze,
        {
            ("2024-03-01", "10"): [
                _rec("Austin", "2024-03-01T10:05:00Z"),
                _rec("", "2024-03-01T10:06:00Z"),  # city_missing
                _rec("Hot", "2024-03-01T10:07:00Z", temp=77.7),
            ]
        },
    )
    m = run_batch(spark, bronze, gold, quarantine_path=quarantine)
    assert m.quarantined_rows == 2
    q = spark.read.json(f"{quarantine}/invalid")
    tags = sorted(t for r in q.collect() for t in json.loads(r["validation_errors"]))
    assert tags == ["city_missing", "temp_out_of_range"]


def test_gold_reader_never_sees_torn_table(spark, tmp_path):
    """Reader/writer interleave on the PIPELINE path (write_gold/load_gold):
    every concurrent read resolves exactly one committed snapshot — the
    default gold path is transactional, not just the TxnTable unit surface."""
    import threading

    from rxlan_aws_lakehouse_spark.pipeline.gold import write_gold

    gold = str(tmp_path / "gold")

    def batch(n, hour):
        return spark.range(n).select(
            F.lit("Austin").alias("city"),
            F.col("id").cast("double").alias("temp_c"),
            F.lit("2024-03-01").alias("dt"),
            F.lit(hour).alias("hour"),
        )

    write_gold(batch(5, "00"), gold)
    # committed totals: each loop replaces hour "01" with k rows -> 5 + k
    committed = {5}
    lock = threading.Lock()
    stop = threading.Event()
    errors: list[str] = []

    def writer():
        try:
            for k in (10, 20, 30):
                with lock:
                    committed.add(5 + k)
                write_gold(batch(k, "01"), gold)
        finally:
            stop.set()

    w = threading.Thread(target=writer)
    w.start()
    while not stop.is_set():
        n = load_gold(spark, gold).count()
        with lock:
            ok = n in committed
        if not ok:
            errors.append(f"torn read: {n} rows not a committed total")
            break
    w.join()
    assert not errors, errors
    assert load_gold(spark, gold).count() == 35
    # hour=00 files were carried by reference through every reload
    from rxlan_aws_lakehouse_spark.txn import TxnTable

    assert TxnTable(gold).history()[-1]["n_files_carried"] >= 1
