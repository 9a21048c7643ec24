"""Driver-rotation staleness logic (queries/__init__.py) and the
CONTENT_KEYS.json freshness gate (tools/update_content_keys.py).

The rotation orders the registry stalest-driver-evidence-first so the
driver's ~50-row CORRECTNESS window both extends coverage and re-greens
the oldest rows. Round 8 made staleness CONTENT-KEYED: a driver row
recorded before the query's plan/oracle was rewritten no longer counts
as evidence (r7 verdict, task 2).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from rxlan_aws_lakehouse_spark import queries as qmod


def test_content_keys_file_matches_head():
    """CONTENT_KEYS.json must be regenerated whenever a query plan or
    oracle changes — otherwise a rewrite silently keeps stale driver
    evidence. Failing here means: run python tools/update_content_keys.py."""
    import update_content_keys as uck

    with open(os.path.join(REPO, "CONTENT_KEYS.json")) as f:
        committed = json.load(f)
    current = uck.current_hashes()
    assert set(committed) == set(current), (
        "registry/name drift — run tools/update_content_keys.py: "
        f"missing={sorted(set(current) - set(committed))} "
        f"extra={sorted(set(committed) - set(current))}"
    )
    stale = sorted(
        n for n, h in current.items() if committed[n]["hash"] != h
    )
    assert not stale, (
        f"content changed without re-keying — run tools/update_content_keys.py: {stale}"
    )


def test_rewritten_query_requeues_as_never_checked(monkeypatch):
    """A query whose content changed after its last driver row must jump
    to the front of the rotation (effective rank -1), ahead of both the
    never-checked cohort and the stale tail."""
    monkeypatch.setattr(
        qmod,
        "_last_checked_rounds",
        lambda: {
            "rewritten_q": (6, True),   # green row, but from round 6...
            "fresh_q": (7, True),
            "stale_q": (2, True),
        },
    )
    monkeypatch.setattr(
        qmod,
        "_content_since_rounds",
        lambda: {"rewritten_q": 7},     # ...content rewritten in round 7
    )

    class _Mod:
        QUERIES = {
            "rewritten_q": lambda s, d: None,
            "fresh_q": lambda s, d: None,
            "stale_q": lambda s, d: None,
            "never_q": lambda s, d: None,
        }
        ORACLE = {n: "SELECT 1" for n in QUERIES}

    monkeypatch.setattr(qmod, "_MODULES", (_Mod,))
    order = list(qmod.all_queries())
    assert order == ["rewritten_q", "never_q", "stale_q", "fresh_q"]


def test_untouched_query_keeps_its_evidence(monkeypatch):
    """since_round <= last driver row leaves the ordering untouched —
    content keys only invalidate, never refresh."""
    monkeypatch.setattr(
        qmod,
        "_last_checked_rounds",
        lambda: {"a": (3, True), "b": (5, True)},
    )
    monkeypatch.setattr(qmod, "_content_since_rounds", lambda: {"a": 2, "b": 0})

    class _Mod:
        QUERIES = {"a": lambda s, d: None, "b": lambda s, d: None}
        ORACLE = {"a": "SELECT 1", "b": "SELECT 1"}

    monkeypatch.setattr(qmod, "_MODULES", (_Mod,))
    assert list(qmod.all_queries()) == ["a", "b"]


def test_live_registry_front_of_queue_is_current():
    """Invariant (r8 verdict, task 1): at HEAD, every query in the
    content-invalidated ∪ never-checked cohort — computed from the
    committed CONTENT_KEYS.json and CORRECTNESS_r*.json artifacts, the
    same inputs the rotation reads — sits inside the driver's ~50-row
    window. Vacuously green when the cohort is empty (full driver
    coverage, nothing invalidated), and stays green regardless of which
    artifact files happen to exist, unlike the round-8 version that
    pinned seven query names whose staleness expired the moment the
    driver sampled them."""
    names = list(qmod.all_queries())
    checked = qmod._last_checked_rounds()
    since = qmod._content_since_rounds()
    cohort = sorted(
        n
        for n in names
        if checked.get(n, (0, False))[0] < since.get(n, 0)  # invalidated
        or n not in checked                                 # never checked
    )
    late = [(n, names.index(n)) for n in cohort if names.index(n) >= 50]
    assert not late, f"stale cohort outside the 50-row driver window: {late}"


def test_window_pressure_cohort_drains_in_ceil_n_over_50_rounds(
    monkeypatch,
):
    """r9 verdict task 8: at registry size ~200, a mass invalidation
    (N > 50 queries rewritten in one round) exceeds the driver's ~50-row
    window. Simulating the driver loop — each round checks the FIRST 50
    of all_queries() and records rows — the invalidated cohort must
    drain in exactly ceil(N/50) rounds (each window slot consumed by a
    not-yet-revalidated query, none wasted on fresh rows), while the
    untouched stale tail keeps its oldest-evidence-first order behind
    the cohort."""
    import math

    N_REGISTRY, N_INVALID, WINDOW, NOW = 230, 120, 50, 11

    class _Mod:
        QUERIES = {
            f"q{i:03d}": (lambda s, d: None) for i in range(N_REGISTRY)
        }
        ORACLE = {n: "SELECT 1" for n in QUERIES}

    monkeypatch.setattr(qmod, "_MODULES", (_Mod,))
    # every query has old green evidence, spread over rounds 1..10
    checked = {
        f"q{i:03d}": (1 + (i % 10), True) for i in range(N_REGISTRY)
    }
    # a mass rewrite in round NOW invalidates the first N_INVALID
    invalid = {f"q{i:03d}" for i in range(N_INVALID)}
    since = {n: NOW for n in invalid}
    monkeypatch.setattr(qmod, "_content_since_rounds", lambda: dict(since))
    monkeypatch.setattr(
        qmod, "_last_checked_rounds", lambda: dict(checked)
    )

    rounds_needed = math.ceil(N_INVALID / WINDOW)
    remaining = set(invalid)
    for rnd in range(NOW, NOW + rounds_needed):
        order = list(qmod.all_queries())
        window = order[:WINDOW]
        # while the cohort overfills the window, EVERY slot goes to a
        # not-yet-revalidated query (no slot wasted on fresh rows)
        if len(remaining) >= WINDOW:
            assert set(window) <= remaining, (
                "window wasted on already-fresh rows while the cohort "
                f"overfills it: {sorted(set(window) - remaining)[:5]}"
            )
        took = remaining & set(window)
        assert len(took) == min(WINDOW, len(remaining))
        remaining -= took
        for n in window:  # driver records green rows for the window
            checked[n] = (rnd, True)
    assert not remaining, (
        f"cohort did not drain in {rounds_needed} rounds: "
        f"{sorted(remaining)[:5]}"
    )
    # after the drain, the front of the queue is the untouched stale
    # tail, oldest driver evidence first
    order = list(qmod.all_queries())
    tail = [n for n in order if n not in invalid][: WINDOW]
    ranks = [checked[n][0] for n in tail]
    assert ranks == sorted(ranks), "stale tail not oldest-first"
