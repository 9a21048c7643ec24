"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints exactly ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each headline query is executed as a full action (count of the result after
all transformations) so every stage — scan, shuffle, agg, join, UDF — runs.
A warmup pass on the smallest table amortizes JVM/session start cost out of
the per-query numbers; the session itself is started before the clock.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from rxlan_aws_lakehouse_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one representative per plan family (scan+agg, join pipeline,
# window, as-of, dedup/LSH, similarity top-k, text). Kept to ~10 so the
# per-round bench finishes fast but still exercises every shuffle shape.
HEADLINE = [
    "tpch_q1",           # full scan + 2-key hash agg, 8 aggregates
    "tpch_q3",           # 3-way join + agg + top-k
    "tpch_q5",           # 6-way join pipeline (broadcast dims)
    "tpch_q18_big_orders",  # HAVING over fact agg + join-back
    "ref_group_count_max",  # events groupBy(dt,hour)
    "window_topk",       # ranking window over events
    "sessionize_events",    # two-window sessionization
    "asof_purchase_click",  # as-of join (union+window)
    "dedup_minhash_pairs",  # MinHash+LSH band buckets
    "dedup_exact_stats",    # exact hash dedup
    "emb_cosine_topk",   # brute-force cosine top-k over embeddings
    "emb_centroid_dist",    # per-label centroid similarity
    "text_quality",      # document quality scoring
    # round-4 lanes — the newest (least-benched) code, one per family, so
    # regressions there show up round-over-round:
    "txn_merge_evolved",    # txn MERGE + additive schema evolution
    "txn_incremental_agg",  # change-feed incremental aggregate refresh
    "multimodal_frame_sample",  # adaptive frame sampling (scan-side exprs)
    "text_pack_sequences",  # md5-bucketed sequence packing
    "contamination_check",  # bipartite LSH band join vs eval set
    # round-5 lanes:
    "scd2_customer_history",  # SCD2 interval rebuild (one window pass)
    "dedup_containment",    # directed containment over LSH candidates
    "json_variant_ops",     # VARIANT parse-once / typed extraction
    # round-6 lanes — the three most join-intensive TPC-H plans (never
    # previously benched round-over-round) plus the new rotated-LSH index:
    "tpch_q8_mktshare",     # 8-way join + year/market-share agg
    "tpch_q9_profit",       # 6-way join incl. part LIKE-filter fan-out
    "tpch_q21_waiting",     # exists/not-exists double correlated semi-join
    "emb_ann_rotated",      # Rademacher-rotated multi-table LSH ANN
    # round-8 lanes:
    "join_skew_salted",     # Zipf fact through salted join + two-phase agg
    "txn_cbo_broadcast_join",  # stat-registered txn dim, CBO-planned join
    "zorder_box_read",      # Morton-clustered rewrite + 2D box read
    "txn_deferred_delete",  # deletion-vector merge-on-read + materialize
    # round-8 late lanes (the newest capability families):
    "sketch_quantile_rollup",  # mergeable histogram sketches -> p50/95/99
    "txn_full_sync",        # three-clause MERGE full-extract sync
    "txn_hidden_partitioning",  # generated dt=day(ts) + derived pruning
    "emb_index_incremental",    # stored ANN index refreshed at delta cost
    # round-9 lanes:
    "txn_merge_dv",          # deletion-vector merge-on-read MERGE
    "streaming_replay_counts",  # replayable shard-log stream, 2-run drain
    "txn_writer_roundtrip",  # DSv2 Arrow writer + session-free commit
    "text_ngram_lm_score",   # corpus bigram LM train + score
    # round-9 late lanes:
    "geo_grid_join",         # eps-grid spatial self-join vs brute oracle
    "sketch_countmin_topk",  # mergeable count-min heavy hitters
    "txn_stream_writer_sink",  # native replaylog -> txn streaming pair
    # round-10 lanes:
    "txn_sql_dml",           # SQL MERGE/UPDATE/DELETE/INSERT router script
    "streaming_reshard_counts",  # shard split+merge mid-stream, 5 drains
    # round-11 lanes:
    "txn_export_delta",      # Delta mirror export + sync, DuckDB replay
    "txn_sql_evolution",     # CTAS -> ALTER ADD/RENAME/DROP (mapped) script
    # round-12 lanes:
    "delta_import_foreign",  # foreign _delta_log checkpoint-seeded import
]

# The original 13-query set (rounds 1-5): summed separately so
# round-over-round totals stay mechanically comparable as lanes are added.
HEADLINE_13 = HEADLINE[:13]

# SPARK_GRAFT_LANES=N truncates the suite to its first N lanes. Exists for
# controlled suite-composition A/Bs (r8 verdict, task 2): run the r7-era
# 25-lane prefix and the full suite at the SAME HEAD and attribute
# shared-lane drift to suite length vs real regression.
#
# A/B RESULT (r9, one HEAD, same machine, back-to-back, median-of-3):
# the five lanes the r8 driver bench showed drifting vs r7 —
# scd2_customer_history +49%, contamination_check +32%, emb_ann_rotated
# +31%, tpch_q8/q9 +26% — re-measured under BOTH compositions.
# 25-lane-suite vs 33-lane-suite medians (sec):
#   scd2_customer_history  0.663 vs 0.630   (-5.1%)
#   contamination_check    1.712 vs 1.694   (-1.1%)
#   emb_ann_rotated        2.417 vs 1.985  (-17.9%)
#   tpch_q8_mktshare       1.425 vs 1.121  (-21.3%)
#   tpch_q9_profit         0.874 vs 0.839   (-4.0%)
# Shared-25 subtotals: 23.34 s (25-lane suite) vs 21.33 s (33-lane suite).
# VERDICT: suite length is ruled out as the drift mechanism — the LONGER
# suite was flat-to-FASTER on every flagged lane (more accumulated JIT,
# no code-cache/GC penalty). The absolute levels of both runs sat ~20%
# above the r7/r8 driver readings across the board (uniformly, incl.
# lanes that never drifted), i.e. ambient co-tenant load dominates
# lane-level numbers at the ~0.5-2 s scale on shared hosts. Conclusion
# for the r8 drift: host noise, the r3 +25% phantom failure mode — no
# plan changed (verified by diff), no composition effect exists, and no
# code fix applies. Round-over-round comparisons should weight the
# 13-lane and shared-25 SUBTOTALS, not individual sub-second lanes.
_LANES = os.environ.get("SPARK_GRAFT_LANES")
if _LANES:
    HEADLINE = HEADLINE[: int(_LANES)]


def infer_sf(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return -1.0


N_RUNS = 3  # measured passes per query (after the warmup pass)

# ---------------------------------------------------------------------------
# In-suite noise calibration (round 10, r9 verdict task 2). Three rounds
# (r3, r8, r9) burned builder+judge effort adjudicating 15-50% bench
# drift that post-hoc A/Bs kept attributing to ambient co-tenant host
# load. The fix: a fixed CPU-bound lane — no IO, no shuffle beyond the
# final 32-partial reduce, pinned synthetic data (spark.range), result
# checked for bit-exactness — run FIRST and LAST, so every BENCH_rN
# carries its own measurement of how loaded the host was. Round-over-
# round comparisons should use the *_norm numbers (raw / noise_factor);
# a noise_factor near 1.0 says the raw numbers are trustworthy, 1.2
# says the host was ~20% oversubscribed and raw drift is not ours.
CALIB_N = 4_000_000_000  # ~1.7 s hot on an idle local[32]
# Reference wall: the idle-host floor observed across repeated
# median-of-3 hot passes at the r10 HEAD (local[32], 128 GiB; best
# medians 1.49-1.56 s under light load). The absolute value only anchors
# the scale — normalization divides by (measured / ref), so any stable
# constant yields consistent round-over-round comparisons.
CALIB_REF = 1.50
_CALIB_EXPECT = (112953131017, -4824579097456148233)  # sum, xor at CALIB_N


def run_calibration(spark) -> float:
    """Median-of-3 hot wall of the fixed CPU lane (1 discarded warmup).
    Deterministic result doubles as a correctness check — a wrong sum
    means the calibration itself can't be trusted."""
    from pyspark.sql import functions as F

    def once() -> float:
        df = spark.range(0, CALIB_N, 1, 32).select(
            F.sum(F.xxhash64("id") % 1000003).alias("h"),
            F.bit_xor(F.xxhash64("id", "id")).alias("x"),
        )
        t0 = time.perf_counter()
        row = df.collect()[0]
        dt = time.perf_counter() - t0
        assert (row["h"], row["x"]) == _CALIB_EXPECT, "calibration result drifted"
        return dt

    once()  # warmup: codegen for this exact plan
    times = sorted(once() for _ in range(3))
    return round(times[1], 4)


# ---------------------------------------------------------------------------
# Round 14 (r13 verdict task 5): the single CPU calibration lane swung
# 19% in one round and painted raw-flat, code-untouched sub-second lanes
# as +16-20% "normalized regressions" — sub-second lanes sit at fixed-
# overhead FLOORS that do not track machine speed the way a 1.5 s
# CPU-bound lane does. Two fixes, both in the emitted JSON:
#
# 1. a CALIBRATION BASKET — the CPU lane plus an IO-bound lane (scan a
#    pinned synthetic parquet) and a sub-second FLOOR lane (tiny fixed
#    plan: measures scheduler/py4j/codegen overhead, what actually
#    bounds sub-second lanes).  basket_noise_factor is the MEDIAN of
#    the three ratios; the individual ratios are reported so a
#    divergence (CPU busy but IO idle, etc.) is visible instead of
#    silently contaminating every lane.
# 2. a SELF-NORMALIZING vs-previous comparison (``vs_prev``): per-lane
#    raw ratios against the newest BENCH_r*.json in the repo, with the
#    MEDIAN lane ratio as the round-over-round scale estimate — robust
#    to any one lane's variance and to any one calibration lane's
#    swing.  Lanes that genuinely changed stand out AGAINST that median
#    instead of defining it.  The legacy noise_factor/*_norm fields
#    remain for continuity.
IO_CALIB_ROWS = 30_000_000  # ~240 MB parquet, written once per host
# Refs are the END-OF-SUITE idle-host values (the basket runs after
# every lane, against a fully JIT-warm JVM and a page-cache-warm IO
# file — measured at the r14 HEAD: cpu 1.489 s, io 0.191 s,
# floor 0.063 s), so an idle host reads ~1.0 on all three ratios.
IO_CALIB_REF = 0.19
FLOOR_CALIB_REF = 0.063


def run_calibration_io(spark) -> float:
    """Median-of-3 hot wall of a pinned-parquet scan+agg (IO lane).
    The file is synthetic, deterministic, and reused across runs."""
    from pyspark.sql import functions as F

    p = os.path.join(
        os.environ.get("TMPDIR", "/tmp"),
        f"spark_graft_bench_io_{IO_CALIB_ROWS}.parquet",
    )
    if not os.path.exists(os.path.join(p, "_SUCCESS")):
        spark.range(0, IO_CALIB_ROWS, 1, 32).select(
            F.col("id"),
            F.xxhash64("id").alias("h"),
            (F.col("id") % 97).cast("double").alias("v"),
        ).write.mode("overwrite").parquet(p)

    def once() -> float:
        t0 = time.perf_counter()
        n = (
            spark.read.parquet(p)
            .where(F.col("v") < 50)
            .agg(F.bit_xor("h"), F.count("*"))
            .collect()
        )
        dt = time.perf_counter() - t0
        assert n[0][1] > 0
        return dt

    once()
    times = sorted(once() for _ in range(3))
    return round(times[1], 4)


def run_calibration_floor(spark) -> float:
    """Median-of-5 wall of a tiny fixed plan — measures the per-action
    fixed overhead (scheduler, py4j, result fetch) that BOUNDS every
    sub-second lane."""
    from pyspark.sql import functions as F

    def once() -> float:
        t0 = time.perf_counter()
        spark.range(0, 1000, 1, 8).agg(F.sum("id")).collect()
        return time.perf_counter() - t0

    once()
    times = sorted(once() for _ in range(5))
    return round(times[2], 4)


def compare_previous(per_query: dict) -> dict | None:
    """Self-normalizing round-over-round comparison: per-lane raw
    ratios vs the newest BENCH_r*.json beside this file, median lane
    ratio as the scale estimate.  Returns None when no previous round
    is on disk (fresh clone)."""
    import glob
    import re
    import statistics

    here = os.path.dirname(os.path.abspath(__file__))
    cur_cpus = int(
        os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)
    )
    cands = []  # (round, clean_host, is_driver, name, queries)
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)", os.path.basename(p))
        if not m:
            continue
        try:
            with open(p) as f:
                d = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        inner = d.get("parsed") or d
        q = inner.get("queries") or {}
        if not q:
            continue
        # a baseline taken at a DIFFERENT core count (e.g. the driver's
        # 8-core scaling run, BENCH_r16_c8) is not a valid vs_prev
        # anchor — per-lane ratios would read scaling, not drift
        cpus = d.get("cpus", inner.get("cpus"))
        if cpus is not None and int(cpus) != cur_cpus:
            continue
        # r16 verdict: NEVER anchor on a host-flagged artifact when a
        # clean one exists at the same round — the r16 driver run was
        # +41% pure host load and would paint every lane as improved
        clean = not bool(inner.get("host_flagged", False))
        cands.append(
            (int(m.group(1)), clean, "_local" not in p,
             os.path.basename(p), q)
        )
    if not cands:
        return None
    best = max(cands, key=lambda c: (c[0], c[1], c[2]))
    prev_name, prev_q = best[3], best[4]
    best_n = best[0]
    shared = sorted(set(per_query) & set(prev_q))
    ratios = {
        k: round(per_query[k] / prev_q[k], 4)
        for k in shared
        if prev_q[k] > 0
    }
    if not ratios:
        return None
    med = round(statistics.median(ratios.values()), 4)
    cur_sub = round(sum(per_query[k] for k in shared), 4)
    prev_sub = round(sum(prev_q[k] for k in shared), 4)
    return {
        "prev_file": prev_name,
        "prev_round": best_n,
        "n_shared_lanes": len(shared),
        "median_lane_ratio": med,
        "shared_subtotal_raw_ratio": round(cur_sub / prev_sub, 4)
        if prev_sub
        else None,
        "shared_subtotal_cur": cur_sub,
        "shared_subtotal_prev": prev_sub,
        # per-lane ratios (file JSON only): divide by median_lane_ratio
        # to read a lane's genuine movement net of host scale; a lane
        # that GAINED WORK shows as an outlier against ~1.0 peers
        "lane_ratios": ratios,
        "lane_ratios_vs_median": {
            k: round(v / med, 4) for k, v in ratios.items()
        },
    }


def main() -> None:
    spark = get_spark("bench")
    queries = entrymod.queries()

    # Per-lane protocol (round 7): clear the executor cache, ONE warmup
    # pass (codegen/classloading + this lane's own index build — the
    # dedup/ANN lanes persist their LSH index, which the measured passes
    # then legitimately reuse: steady-state behavior), then N measured
    # passes. The clearCache at lane START is the fix for the r6 finding
    # that lanes never unpersist'ed their indexes — by the final lanes the
    # executor heap carried EVERY prior lane's persisted index
    # simultaneously, a cross-lane coupling no real workload has.
    #
    # Median-of-N per query: a single timed pass is hostage to co-tenant
    # machine load (round 3's driver reading was +25% pure noise). The
    # median absorbs one bad pass; the min is also reported as the
    # "machine-idle floor" for cross-round comparisons.
    # Neutral JIT warmup (round 8, r7 verdict task 3): before lane 1, run
    # two NON-headline queries (scan+agg, small join) repeatedly so the
    # shared Spark paths (parquet reader, hash-agg, broadcast join,
    # codegen compiler) reach C2-compiled steady state. Measured at the
    # r8 HEAD, tpch_q1 as the first lane: 0.641 s cold (fresh JVM, the
    # +92% phantom regression the r7 driver bench recorded), 0.59 s after
    # 1 warmup round, 0.44 s after 3, 0.33 s after 8 — matching the
    # 0.304 s the r7 judge measured after a full-suite warmup. 8 rounds
    # (~5 s) buys the asymptote. The warmup queries are deliberately not
    # in HEADLINE, and per-lane clearCache() still isolates data/cache
    # residency between lanes.
    for _ in range(8):
        queries["ref_count_star"](spark, SF_DIR).count()
        queries["tpch_q14_promo"](spark, SF_DIR).count()
    spark.catalog.clearCache()

    calib_first = run_calibration(spark)

    per_query: dict[str, float] = {}
    per_query_min: dict[str, float] = {}
    lane_retries: dict[str, int] = {}

    def _transient(e: Exception) -> bool:
        """Only the environment failure classes the retry was built for
        (r16 ADVICE: a bare ``except Exception`` also absorbed one
        occurrence of any REAL intermittent lane bug as 'transient'):
        the Python worker's hard 10 s connect-back deadline tripping
        under hypervisor stalls, and py4j transport drops."""
        try:
            from py4j.protocol import Py4JNetworkError

            if isinstance(e, Py4JNetworkError):
                return True
        except ImportError:
            pass
        msg = str(e)
        return (
            "failed to connect back" in msg
            or "Python worker exited unexpectedly" in msg
            or "PYTHON_WORKER_FAILED" in msg
        )

    def run_pass(name, fn):
        """One full execution of a lane; returns ITS OWN wall seconds.
        A transient environment failure (observed twice in r16: the
        Python worker's hard 10 s connect-back deadline tripping under
        hypervisor stall episodes) is retried ONCE instead of aborting
        the entire suite artifact; the retry is a complete fresh
        execution and ONLY its wall is what gets recorded (r16 ADVICE:
        the previous shape timed from before the failed attempt, so a
        retried pass recorded failed-attempt + sleep + retry — an
        inflated sample). Methodology (count of the full result,
        median-of-N) is unchanged. Retries are counted in the emitted
        JSON so a flaky host is visible."""
        t0 = time.perf_counter()
        try:
            fn(spark, SF_DIR).count()
            return time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001 - classify, retry once
            if not _transient(e):
                raise
            lane_retries[name] = lane_retries.get(name, 0) + 1
            time.sleep(2.0)
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            return time.perf_counter() - t0

    for name in HEADLINE:
        fn = queries[name]
        spark.catalog.clearCache()  # no cross-lane cache residency
        # warmup: codegen + lane's index build. SUB-SECOND lanes get two
        # extra unmeasured passes (r11 verdict task 8): at that scale
        # per-lane fixed costs (C2 compilation of this exact plan,
        # classloading) dominate the wall, and a single warmup leaves
        # the first measured pass 20-40% hot-vs-cold noise — the
        # tpch_q1/q5-class whipsaw three rounds of bench deltas chased.
        # Extra passes cost <2 s suite-wide and only ever run when cheap.
        if run_pass(name, fn) < 1.0:
            for _ in range(2):
                run_pass(name, fn)
        # Round 15 (r14 verdict task 5): the two sketch lanes are
        # SLOPE-measured without this — a 5-rep idle-host probe reads
        # consecutive executions at ~10.6 / 5.2 / 4.3 / 4.3 s (JIT +
        # page-cache warm-in of the build->write->read-back shape), so
        # with one warmup + median-of-3 the recorded value sits wherever
        # suite-wide JIT pressure happens to put pass 3: r13 recorded
        # the 4.3 point, r14 the 5.2 point, both with ops/sketches.py
        # untouched.  Two extra unmeasured passes move the measurement
        # onto the asymptote — the same rationale as the sub-second
        # rule above, paid only on these two lanes (~10 s suite-wide).
        # Round 16 (r15 verdict task 6): the Arrow micro-lanes
        # emb_cosine_topk / emb_centroid_dist / text_quality moved
        # 1.15-1.30x together with untouched code — the same warm-up-
        # slope signature (their sub-second rule already grants 2
        # extra passes, but Arrow serializer + pandas-UDF worker
        # startup warm in later than plan codegen does).  Same fix:
        # two more unmeasured passes, pennies at their scale.
        if name in (
            "sketch_quantile_rollup",
            "sketch_countmin_topk",
            "emb_cosine_topk",
            "emb_centroid_dist",
            "text_quality",
        ):
            for _ in range(2):
                run_pass(name, fn)
        times = [run_pass(name, fn) for _ in range(N_RUNS)]
        times.sort()
        per_query[name] = round(times[len(times) // 2], 4)
        per_query_min[name] = round(times[0], 4)
    spark.catalog.clearCache()

    calib_last = run_calibration(spark)
    noise = round(((calib_first + calib_last) / 2) / CALIB_REF, 4)
    calib_io = run_calibration_io(spark)
    calib_floor = run_calibration_floor(spark)
    basket_ratios = {
        "cpu": round(((calib_first + calib_last) / 2) / CALIB_REF, 4),
        "io": round(calib_io / IO_CALIB_REF, 4),
        "floor": round(calib_floor / FLOOR_CALIB_REF, 4),
    }
    basket_noise = sorted(basket_ratios.values())[1]  # median of 3
    # Round 15 (r14 verdict task 8): the basket caught real co-tenant
    # load in the r14 driver run (io 2.02x, floor 1.34x vs anchors) —
    # codify the adjudication rule as a self-annotation so every
    # artifact says whether its host was clean: flagged when the
    # median ratio says the host is >10% loaded, or any single basket
    # lane is >25% off its idle anchor (one-dimension contention —
    # e.g. an io-heavy co-tenant — that the median alone can hide).
    host_flagged = basket_noise > 1.10 or max(
        basket_ratios.values()
    ) > 1.25
    host_note = (
        "host loaded (basket ratios off idle anchors): raw walls are "
        "not comparable round-over-round — read vs_prev "
        "median_lane_ratio, or re-run on an idle host"
        if host_flagged
        else "host clean: basket ratios within idle anchors"
    )

    def norm(x: float) -> float:
        return round(x / noise, 4)

    total = round(sum(per_query.values()), 4)
    h13 = round(
        sum(per_query[n] for n in HEADLINE_13 if n in per_query), 4
    )
    result = {
        "metric": "headline_total_wall",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "queries_min": per_query_min,
        "min_total": round(sum(per_query_min.values()), 4),
        "headline_13_subtotal": h13,
        # noise calibration (r9 verdict task 2): compare the
        # *_norm numbers round-over-round, not the raw walls
        "calib_first": calib_first,
        "calib_last": calib_last,
        "calib_ref": CALIB_REF,
        "noise_factor": noise,
        "value_norm": norm(total),
        "headline_13_subtotal_norm": norm(h13),
        "queries_norm": {k: norm(v) for k, v in per_query.items()},
        # r13 verdict task 5: the basket median replaces the single
        # CPU lane as the trustworthy host-load estimate, and vs_prev
        # is the self-normalizing per-lane comparison — judge reads
        # median_lane_ratio (host scale) and lane_ratios_vs_median
        # (which lanes genuinely moved / gained work)
        "calib_basket": {
            "cpu_sec": round((calib_first + calib_last) / 2, 4),
            "io_sec": calib_io,
            "floor_sec": calib_floor,
            "refs": {
                "cpu": CALIB_REF,
                "io": IO_CALIB_REF,
                "floor": FLOOR_CALIB_REF,
            },
            "ratios": basket_ratios,
            "basket_noise_factor": basket_noise,
        },
        "host_flagged": host_flagged,
        "host_note": host_note,
        "vs_prev": compare_previous(per_query),
        "runs_per_query": N_RUNS,
        "lane_retries": lane_retries,
        "sf": infer_sf(SF_DIR),
        # recorded so future vs_prev picks can filter out baselines
        # taken at a different core count (the c8 scaling artifacts)
        "cpus": int(
            os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)
        ),
    }
    # Full result to a known path (r10 verdict, "what's wrong" #2): the
    # driver's stdout capture keeps only a bounded tail, which truncated
    # the r9/r10 JSON mid-line. The file is the robust channel; stdout
    # still carries the complete JSON as its FINAL line (compact
    # separators, detail dicts moved to the file) for tail-based capture.
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_result.json"
    )
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    sys.stdout.flush()
    compact = {
        k: v
        for k, v in result.items()
        if k not in ("queries_min", "queries_norm")
    }
    if compact.get("vs_prev"):
        # per-lane ratio dicts live in the file JSON only
        compact["vs_prev"] = {
            k: v
            for k, v in compact["vs_prev"].items()
            if not k.startswith("lane_ratios")
        }
    compact["result_path"] = out_path
    print(json.dumps(compact, separators=(",", ":")))


if __name__ == "__main__":
    main()
