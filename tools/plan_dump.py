"""Dump `.explain("formatted")` for named lanes to plans/<tag>/<lane>_<suffix>.txt.

Usage: python tools/plan_dump.py <tag> <suffix> <lane> [lane ...]
   e.g. python tools/plan_dump.py r16 before tpch_q5 txn_sql_dml

For driver-orchestrated lanes whose returned frame is a LocalTableScan /
createDataFrame materialization, the interesting plans are the INTERIOR
frames the lane executes; like tools/explain_all.py this instruments
DataFrame.collect while the lane runs and appends the formatted plans of
the largest interior frames after the final frame's plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from rxlan_aws_lakehouse_spark.session import get_spark  # noqa: E402

_TRIVIAL = ("Scan ExistingRDD", "LocalTableScan")
_MAX_INTERIOR = 5


def _formatted(df) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return qe.explainString(mode)


def _run_capturing(fn, spark, sf_dir):
    from pyspark.sql.classic.dataframe import DataFrame

    captured: list[str] = []
    orig = DataFrame.collect

    def patched(self):
        try:
            captured.append(_formatted(self))
        except Exception:  # noqa: BLE001
            pass
        return orig(self)

    DataFrame.collect = patched
    try:
        return fn(spark, sf_dir), None, captured
    except Exception as e:  # noqa: BLE001
        return None, e, captured
    finally:
        DataFrame.collect = orig


def _interesting(plans: list[str]) -> list[str]:
    seen: set[str] = set()
    uniq = []
    for p in plans:
        body = p.strip()
        if body in seen:
            continue
        seen.add(body)
        first = body.splitlines()[0] if body else ""
        if any(t in first for t in _TRIVIAL) and len(body.splitlines()) <= 4:
            continue
        uniq.append(body)
    uniq.sort(key=lambda s: -len(s))
    return uniq[:_MAX_INTERIOR]


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    lanes = sys.argv[3:]
    sf_dir = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.001")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-dump")
    qs = entrymod.queries()
    for name in lanes:
        df, err, interior = _run_capturing(qs[name], spark, sf_dir)
        parts: list[str] = [f"# {name} — explain('formatted') at {sf_dir}\n"]
        if err is not None:
            parts.append(f"ERROR: {type(err).__name__}: {err}\n")
        else:
            plan = _formatted(df)
            parts.append(plan.rstrip() + "\n")
            head = "\n".join(plan.splitlines()[:4])
            if any(t in head for t in _TRIVIAL):
                for i, p in enumerate(_interesting(interior), 1):
                    parts.append(
                        f"\n## interior frame {i} (captured at collect)\n"
                    )
                    parts.append(p.rstrip() + "\n")
        out = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(out, "w") as f:
            f.write("\n".join(parts))
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
