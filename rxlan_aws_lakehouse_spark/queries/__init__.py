"""Named query registry.

Each submodule exposes two dicts keyed by query name:
    QUERIES : name -> Callable[(SparkSession, sf_dir str), DataFrame]
    ORACLE  : name -> ANSI SQL string DuckDB can run on the same parquet views
              (absent for genuinely non-SQL-expressible ops -> rows-only check)

Column names and value rounding are aligned between the Spark plan and the
oracle SQL so the driver's order-insensitive value hash matches.
"""

from __future__ import annotations

import glob
import json
import os

from . import (
    analytics,
    llm,
    reference,
    relational,
    relational2,
    relational3,
    relational4,
    sampling,
    streaming_live,
    txn_live,
)

_MODULES = (
    reference, relational, relational2, relational3, relational4, analytics,
    llm, sampling, streaming_live, txn_live,
)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _last_checked_rounds() -> dict[str, tuple[int, bool]]:
    """Per-query (latest round with a driver CORRECTNESS row, whether that
    row was hash-checked), read from the committed CORRECTNESS_r*.json
    artifacts. Drives registry rotation: the driver records at most the
    first ~50 registry entries per round, so ordering STALEST-FIRST
    (never-checked, then oldest-checked) makes every round both extend
    coverage and re-green the oldest prior evidence — regression detection
    for queries outside the most recent window."""
    rounds: dict[str, tuple[int, bool]] = {}
    for path in glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json")):
        base = os.path.basename(path)
        try:
            rnd = int(base[len("CORRECTNESS_r"):-len(".json")])
            with open(path) as f:
                rows = json.load(f)
        except (ValueError, OSError, json.JSONDecodeError):
            continue
        for name, row in rows.items():
            hashed = bool(isinstance(row, dict) and row.get("hash_match"))
            prev = rounds.get(name, (0, False))
            if rnd > prev[0]:
                rounds[name] = (rnd, hashed)
    return rounds


def all_queries():
    merged = {}
    for mod in _MODULES:
        overlap = set(merged) & set(mod.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    oracles = set()
    for mod in _MODULES:
        oracles.update(mod.ORACLE)
    checked = _last_checked_rounds()

    # Sort key: (effective last-checked round, rows-only after
    # hash-checkable, name). The stalest DRIVER EVIDENCE leads — the
    # oldest rows are the ones a silent regression could hide behind
    # longest. Never-checked queries (and queries whose ORACLE APPEARED
    # AFTER their last driver row — their strongest evidence has never
    # been driver-recorded) slot just BEFORE the second-newest cohort:
    # soon enough to be recorded within a round, but never displacing the
    # stale tail out of the driver's ~50-row window (a new query is
    # pytest- and locally-oracle-verified already; an old driver row is
    # the only guard its query has). Among equals, oracle-backed queries
    # outrank rows-only ones; the name tiebreak keeps order deterministic.
    max_round = max((r for r, _h in checked.values()), default=0)

    def effective_round(n: str) -> float:
        rnd, hashed = checked.get(n, (0, False))
        if rnd == 0 or (n in oracles and not hashed):
            return max_round - 1.5
        return rnd

    names = sorted(
        merged,
        key=lambda n: (effective_round(n), n not in oracles, n),
    )
    return {n: merged[n] for n in names}


def all_oracles():
    merged = {}
    for mod in _MODULES:
        merged.update(mod.ORACLE)
    queries_order = list(all_queries())
    rank = {n: i for i, n in enumerate(queries_order)}
    return dict(sorted(merged.items(), key=lambda kv: rank.get(kv[0], 10**9)))
