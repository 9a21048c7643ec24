"""CHECK constraints on txn tables: one-pass in-flight enforcement via
observe() counters, transactional rejection, property inheritance, ANSI
NULL semantics, retroactive validation, and clone/restore travel."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from rxlan_aws_lakehouse_spark.txn import (
    ConstraintViolationError,
    TxnTable,
    _VERSIONS,
)


@pytest.fixture()
def table(spark, tmp_path):
    t = TxnTable(str(tmp_path / "tbl"))
    base = spark.createDataFrame(
        [(1, 10.0, "O"), (2, 25.5, "F"), (3, 7.25, "O")],
        "k INT, amount DOUBLE, status STRING",
    )
    t.commit(base, constraints={"amount_pos": "amount > 0"})
    return t


def test_valid_append_passes_and_inherits(spark, table):
    table.append(
        spark.createDataFrame([(4, 1.5, "P")], "k INT, amount DOUBLE, status STRING")
    )
    assert table.read(spark).count() == 4
    # the property rode the append without being restated
    assert table.constraints() == {"amount_pos": "amount > 0"}


def test_violating_append_rejected_atomically(spark, table):
    head = table.current_version()
    n_slots = len(os.listdir(os.path.join(table.root, _VERSIONS)))
    with pytest.raises(ConstraintViolationError, match="amount_pos"):
        table.append(
            spark.createDataFrame(
                [(5, 2.0, "O"), (6, -3.0, "O")],
                "k INT, amount DOUBLE, status STRING",
            )
        )
    # table unchanged: same head, same rows, staged slot cleaned up
    assert table.current_version() == head
    assert table.read(spark).count() == 3
    assert (
        len(os.listdir(os.path.join(table.root, _VERSIONS))) == n_slots
    )


def test_null_passes_ansi_check_semantics(spark, table):
    table.append(
        spark.createDataFrame(
            [(7, None, "O")], "k INT, amount DOUBLE, status STRING"
        )
    )
    assert table.read(spark).count() == 4


def test_merge_upsert_enforced(spark, table):
    with pytest.raises(ConstraintViolationError):
        table.merge_upsert(
            spark,
            spark.createDataFrame(
                [(2, -99.0, "F")], "k INT, amount DOUBLE, status STRING"
            ),
            keys=["k"],
        )
    # the matched row kept its pre-merge value
    assert (
        table.read(spark).filter(F.col("k") == 2).collect()[0]["amount"]
        == 25.5
    )


def test_add_constraint_validates_existing_data(spark, table):
    with pytest.raises(ConstraintViolationError, match="small_amount"):
        table.add_check_constraint(spark, "small_amount", "amount < 20")
    # not recorded
    assert "small_amount" not in table.constraints()
    # a satisfiable one lands as a metadata-only commit and then enforces
    table.add_check_constraint(spark, "status_known", "status IN ('O','F','P')")
    assert table.constraints() == {
        "amount_pos": "amount > 0",
        "status_known": "status IN ('O','F','P')",
    }
    with pytest.raises(ConstraintViolationError, match="status_known"):
        table.append(
            spark.createDataFrame(
                [(8, 1.0, "X")], "k INT, amount DOUBLE, status STRING"
            )
        )


def test_drop_constraint_and_idempotent_add(spark, table):
    v1 = table.add_check_constraint(spark, "amount_pos", "amount > 0")
    assert v1 == table.current_version()  # idempotent re-add: no commit
    table.drop_constraint(spark, "amount_pos")
    assert table.constraints() == {}
    table.append(
        spark.createDataFrame(
            [(9, -1.0, "O")], "k INT, amount DOUBLE, status STRING"
        )
    )
    assert table.read(spark).count() == 4


def test_constraints_travel_through_clone_and_restore(spark, table, tmp_path):
    clone = table.clone_to(spark, str(tmp_path / "clone"))
    assert clone.constraints() == {"amount_pos": "amount > 0"}
    with pytest.raises(ConstraintViolationError):
        clone.append(
            spark.createDataFrame(
                [(5, -2.0, "O")], "k INT, amount DOUBLE, status STRING"
            )
        )
    # restore to the pre-drop snapshot reinstates the property
    v_with = table.current_version()
    table.drop_constraint(spark, "amount_pos")
    assert table.constraints() == {}
    table.restore(spark, v_with)
    assert table.constraints() == {"amount_pos": "amount > 0"}


def test_enforcement_is_single_pass(spark, table):
    """The write plan itself carries the constraint counters: appending
    through a side-effecting python accumulator-free path can't be
    asserted directly, so pin the cheaper invariant — a valid append
    triggers exactly ONE job over the input (observe rides the write) by
    checking the input is not re-evaluated: a nondeterministic column
    written once stays internally consistent."""
    df = spark.range(100).select(
        F.col("id").cast("int").alias("k"),
        (F.rand(seed=7) + F.lit(0.001)).alias("amount"),
        F.lit("O").alias("status"),
    )
    table.append(df)
    got = table.read(spark).filter(F.col("k") >= 0)
    # every written amount satisfies the constraint AND the stored values
    # are the ones the counters saw (all > 0; a re-evaluation with a
    # different substream could have produced violations post-check)
    assert got.filter(F.col("amount") <= 0).count() == 0
