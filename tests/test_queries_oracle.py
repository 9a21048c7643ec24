"""Every registered query vs its DuckDB oracle at sf0.001 (fast gate).

This mirrors the driver's t2 check (row count + column set + order-insensitive
value multiset) so a regression is caught locally before the round gate.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tools.check_oracle import compare

ALL = sorted(entrymod.queries())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(name, spark, oracle_con, sf_dir):
    ok, msg = compare(name, spark, oracle_con, sf_dir)
    assert ok, f"{name}: {msg}"
