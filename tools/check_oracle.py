"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then compares
row count, column names, and an order-insensitive value multiset.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from rxlan_aws_lakehouse_spark.catalog import TABLES  # noqa: E402
from rxlan_aws_lakehouse_spark.session import get_spark  # noqa: E402


STRICT = os.environ.get("ORACLE_LOOSE", "") == ""


def norm_cell(v):
    if STRICT:
        # Mirror the driver: raw values, type-sensitive (int 0 != float 0.0,
        # date != str). Only NaN gets collapsed (NaN != NaN otherwise).
        if isinstance(v, float) and math.isnan(v):
            return "float:NaN"
        return f"{type(v).__name__}:{v!r}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / float32 noise at comparison time
        return f"{v:.6g}"
    return str(v)


def row_key(row, cols):
    return tuple(norm_cell(row[c]) for c in cols)


def compare(name: str, spark, con, sf_dir: str) -> tuple[bool, str]:
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    sdf = q(spark, sf_dir).toPandas()
    if sql is None:
        return True, f"rows-only ({len(sdf)} rows)"
    odf = con.execute(sql).fetchdf()
    s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
    if s_cols != o_cols:
        return False, f"column mismatch: spark={s_cols} oracle={o_cols}"
    if len(sdf) != len(odf):
        return False, f"row count: spark={len(sdf)} oracle={len(odf)}"
    s_rows = sorted(row_key(r, s_cols) for _, r in sdf.iterrows())
    o_rows = sorted(row_key(r, s_cols) for _, r in odf.iterrows())
    if s_rows != o_rows:
        diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, f"match ({len(sdf)} rows)"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2:]
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    names = only or list(entrymod.queries())
    failed = []
    for name in names:
        try:
            ok, msg = compare(name, spark, con, sf_dir)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"ERROR: {type(e).__name__}: {str(e)[:300]}"
        print(f"{'PASS' if ok else 'FAIL'} {name}: {msg}")
        if not ok:
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    if failed:
        print("failed:", " ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
