"""Driver-contract smoke tests: entry(), queries()/oracle_sql() registry shape."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    # stable schema: calling twice yields identical columns
    assert df.columns == entrymod.entry(spark).columns


def test_registry_consistency():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 45
    # every oracle key must name a real query
    assert set(oracles) <= set(qs)
    # non-SQL-expressible ops (Arrow boundary, iterative algorithms, a
    # Structured Streaming run) are the only permitted rows-only gaps
    gaps = set(qs) - set(oracles)
    # the only rows-only queries left are the genuinely non-SQL ones:
    # real Structured Streaming runs
    assert gaps <= {
        "streaming_cdc_counts",
        "streaming_sessionize_counts",
    }, f"unexpected rows-only queries: {gaps}"


def test_queries_are_callable(spark, sf_dir):
    qs = entrymod.queries()
    # spot-run one from each family without collecting
    for name in ("tpch_q1", "ref_count_star", "dedup_exact_stats"):
        df = qs[name](spark, sf_dir)
        assert df.columns


def test_plans_md_covers_every_query():
    """PLANS.md is plan evidence for ALL registered queries; fail when the
    registry grows without regenerating it (python tools/explain_all.py)."""
    import os
    import re

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "PLANS.md")
    with open(path) as f:
        text = f.read()
    sections = set(re.findall(r"^## (\S+)$", text, flags=re.M))
    registered = set(entrymod.queries())
    missing = registered - sections
    stale = sections - registered
    assert not missing, f"PLANS.md missing plans for: {sorted(missing)}"
    assert not stale, f"PLANS.md has stale sections: {sorted(stale)}"
    assert "ERROR:" not in text
