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
    quality,
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
    llm, quality, sampling, streaming_live, txn_live,
)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _content_since_rounds() -> dict[str, int]:
    """name -> first driver round for which the query's CURRENT content
    (plan source + oracle SQL) is valid, from the committed
    CONTENT_KEYS.json (maintained by tools/update_content_keys.py; a
    pytest gate keeps it in sync with HEAD). A driver row OLDER than this
    validated different content and must not count as evidence."""
    try:
        with open(os.path.join(_REPO_ROOT, "CONTENT_KEYS.json")) as f:
            keys = json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}
    return {
        n: int(v.get("since_round", 0))
        for n, v in keys.items()
        if isinstance(v, dict)
    }


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
    # hash-checkable, name). Priority order (r7 verdict, task 2):
    #   1. CONTENT-INVALIDATED (rank -1): the plan/oracle was rewritten
    #      AFTER the last driver row (CONTENT_KEYS.json since_round >
    #      last checked round) — the existing green row validated
    #      different content, so no current driver evidence exists at
    #      all. These must re-enter the ~50-row window immediately.
    #   2. NEVER-CHECKED (rank -0.5): no driver row ever (includes
    #      queries whose oracle appeared after their last rows-only
    #      row). Locally oracle-verified, but the driver signal — the
    #      hard signal — is absent.
    #   3. The stale tail, oldest driver round first — the rows a
    #      silent regression could hide behind longest.
    # Cohorts 1+2 are small (rewrites + this round's additions), so the
    # stale tail still drains ~40+ rows per round. Among equals,
    # oracle-backed queries outrank rows-only ones; the name tiebreak
    # keeps order deterministic.
    since = _content_since_rounds()

    def effective_round(n: str) -> float:
        rnd, hashed = checked.get(n, (0, False))
        if rnd < since.get(n, 0):
            return -1.0  # driver row predates the current content
        if rnd == 0 or (n in oracles and not hashed):
            return -0.5
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
