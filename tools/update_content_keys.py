"""Maintain CONTENT_KEYS.json — the content-keyed staleness index for the
driver rotation (VERDICT r7 task 2).

Problem: the rotation in ``queries/__init__.py`` keyed staleness on round
number only, so a query whose PLAN or ORACLE was rewritten after its last
driver row kept its old "fresh" rank — e.g. the round-7-rewritten
``emb_neardup`` sat on a round-6 green row that validated the OLD plan.

Fix: this tool stamps every registry query with
    hash        = md5(oracle_sql + "\\x00" + query function source)
    since_round = the first driver round for which this content is current
                  (i.e. latest committed CORRECTNESS round + 1 when the
                  hash changes; preserved when it doesn't).
The rotation then treats a driver row older than ``since_round`` as evidence
for DIFFERENT content and re-queues the query as never-checked.

Run after editing any query/oracle:  python tools/update_content_keys.py
A pytest gate (tests/test_plans.py) fails if the committed file is stale.
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

KEYS_PATH = os.path.join(REPO, "CONTENT_KEYS.json")


def content_hash(fn, oracle_sql: str | None) -> str:
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        src = repr(fn)
    blob = (oracle_sql or "") + "\x00" + src
    return hashlib.md5(blob.encode()).hexdigest()


def current_hashes() -> dict[str, str]:
    from rxlan_aws_lakehouse_spark import queries as q

    merged_q, merged_o = {}, {}
    for mod in q._MODULES:
        merged_q.update(mod.QUERIES)
        merged_o.update(mod.ORACLE)
    return {n: content_hash(fn, merged_o.get(n)) for n, fn in merged_q.items()}


def latest_correctness_round() -> int:
    rounds = [0]
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        base = os.path.basename(path)
        try:
            rounds.append(int(base[len("CORRECTNESS_r"):-len(".json")]))
        except ValueError:
            continue
    return max(rounds)


def main() -> None:
    hashes = current_hashes()
    old: dict[str, dict] = {}
    bootstrap = not os.path.exists(KEYS_PATH)
    if not bootstrap:
        with open(KEYS_PATH) as f:
            old = json.load(f)
    # Bootstrap: presume existing driver evidence matches current content
    # (since_round=0) — entries known to have been rewritten after their
    # last driver row get hand-bumped once, then the tool tracks changes.
    next_round = 0 if bootstrap else latest_correctness_round() + 1
    out, changed, fresh = {}, [], []
    for name in sorted(hashes):
        h = hashes[name]
        prev = old.get(name)
        if prev and prev.get("hash") == h:
            out[name] = prev
        else:
            out[name] = {"hash": h, "since_round": next_round}
            (changed if prev else fresh).append(name)
    dropped = sorted(set(old) - set(hashes))
    with open(KEYS_PATH, "w") as f:
        json.dump(out, f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(out)} keys (since_round={next_round} for updates)")
    if changed:
        print(f"content changed ({len(changed)}): {', '.join(changed)}")
    if fresh:
        print(f"new queries ({len(fresh)}): {', '.join(fresh)}")
    if dropped:
        print(f"dropped ({len(dropped)}): {', '.join(dropped)}")


if __name__ == "__main__":
    main()
