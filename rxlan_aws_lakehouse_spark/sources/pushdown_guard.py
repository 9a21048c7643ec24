"""Driver-side guard making Python-DataSource filter pushdown SAFE.

Spark 4.1's Python DataSource scan planning has a relation-level cache
with two measured wrong-answer modes (probed against pyspark 4.1.2 in
``tests/test_txn_source.py::TestPushdownGuard``; bytecode inspected in
``PythonDataSourceV2.getOrCreateReadInfo`` / ``PythonScanBuilder.
pushFilters``):

1. **Filterless reuse** — ``getOrCreateReadInfo`` caches the last planned
   (partitions, read function) per relation and reuses it WITHOUT calling
   Python whenever a scan pushes no filters, while ``pushFilters``
   overwrites that cache with the FILTERED plan. So after
   ``df.filter(id == 500).count()``, a plain ``df.count()`` on the same
   ``df`` silently replays the single-file pruned plan (measured:
   125 of 1000 rows).
2. **Intra-query aliasing** — two differently-filtered scans of the SAME
   relation in one query (self-join, union of filtered branches) share
   the one cache slot; the last ``pushFilters`` wins for BOTH batches
   (measured: ``df.filter(id<10).union(df.filter(id>990)).count()``
   returns 9, not 19).

No Python hook runs on either broken path (the JVM short-circuits to the
cache), so the defense is driver-side and rests on one safety property:
**a cache holding the FULL, query-independent plan (or nothing) is always
correct** — filters our readers report as unhandled are re-applied
row-level above the scan, so pruning is only ever an IO bound.

The guard wraps the classic ``DataFrame`` / ``DataFrameWriter`` action
entry points. Before delegating, it walks the acted-on frame's ANALYZED
plan leaves (a handful of py4j calls) and collects every Python-
DataSource relation:

* **Always**: reset each relation's cached read info (public
  ``setReadInfo(null)``). The action then plans its own pushdown from
  clean state — filtered queries still prune; a following filterless
  action resets again and re-plans the full list. Kills mode 1.
* **When one relation instance backs two or more scans** (mode 2):
  pre-seed every Python relation in the plan with its FULL-list read
  info (public ``getOrCreateReadInfo`` — the same worker path a
  filterless creation takes), then turn
  ``spark.sql.python.filterPushdown.enabled`` off for just this action
  so ``PythonScanBuilder.pushFilters`` early-returns and nothing
  overwrites the seed; every batch of every scan reuses the one full
  plan and Spark applies the filters row-level. The conf is restored
  and the caches re-reset in ``finally``. (Disabling the conf alone
  does NOT work: the read-info worker refuses a pushFilters-implementing
  reader outright when it sees the conf off — the pre-seed is what
  keeps the worker out of the loop.)

Determinism: for any single-threaded sequence of actions through the
wrapped entry points, every action sees its own freshly planned pushdown,
or the full list — never another query's plan. Residual races, documented
rather than hidden: concurrent driver threads acting on ONE shared
relation with mixed filters can interleave a poison between another
thread's reset and capture (degrades to the unguarded behavior); a
concurrent thread whose action lands entirely inside another thread's
mode-2 conf-off window may fail loudly with DATA_SOURCE_PUSHDOWN_DISABLED
(an error, never silent wrong data). Serialize mixed-filter actions on a
shared relation or load per thread. Actions that bypass the wrapped
surface (``df.rdd``, direct ``_jdf`` calls) are likewise unguarded —
``option("pushdown", "false")`` gives those a query-independent plan.

The reflection (``PythonTable.ds`` / ``PythonDataSourceV2.name`` are
private, read via ``getDeclaredField``) stays legal under JDK 17 because
spark-sql lives on the classpath (unnamed module, open by default).
"""

from __future__ import annotations

import functools

_INSTALLED = False
_CONF_KEY = "spark.sql.python.filterPushdown.enabled"

# DataFrame methods that trigger planning/execution of the frame's plan.
# take/head/first/limit funnel through collect on a derived frame whose
# plan contains the same relations, so collect covers them.
_DF_ACTIONS = (
    "collect",
    "count",
    "toPandas",
    "toArrow",
    "toLocalIterator",
    "show",
    "isEmpty",
    "foreach",
    "foreachPartition",
    "checkpoint",
    "localCheckpoint",
    "tail",
)
_WRITER_ACTIONS = (
    "save",
    "insertInto",
    "saveAsTable",
    "json",
    "parquet",
    "orc",
    "text",
    "csv",
    "jdbc",
)


def _reflect(obj, field: str):
    f = obj.getClass().getDeclaredField(field)
    f.setAccessible(True)
    return f.get(obj)


def _python_relations(df):
    """(relation, ds) for every Python-DataSource leaf of df's analyzed
    plan. py4j walk: a handful of calls, defensive by construction."""
    out = []
    leaves = df._jdf.queryExecution().analyzed().collectLeaves()
    for i in range(leaves.size()):
        leaf = leaves.apply(i)
        if not leaf.getClass().getName().endswith(".DataSourceV2Relation"):
            continue
        t = leaf.table()
        if not t.getClass().getName().endswith(".python.PythonTable"):
            continue
        out.append((leaf, _reflect(t, "ds")))
    return out


def reset_python_scan_caches(df) -> list:
    """Null the cached read info of every Python-DataSource relation in
    ``df``'s analyzed plan. Returns the (relation, ds) pairs found ONLY
    when one ds instance backs two or more scans (the intra-query
    aliasing case); an empty list otherwise. Never raises — the guard
    must not break an action it cannot help."""
    try:
        rels = _python_relations(df)
        seen: set[int] = set()
        dup = False
        for _rel, ds in rels:
            h = ds.hashCode()  # identity hash: not overridden
            if h in seen:
                dup = True
            seen.add(h)
            ds.setReadInfo(None)
        return rels if dup else []
    except Exception:  # noqa: BLE001
        return []


def _guard(orig, get_df):
    @functools.wraps(orig)
    def wrapper(self, *args, **kwargs):
        df = get_df(self)
        dups = reset_python_scan_caches(df)
        if not dups:
            return orig(self, *args, **kwargs)
        sess = df.sparkSession
        old = sess.conf.get(_CONF_KEY, "true")
        try:
            # pre-seed EVERY python relation in this plan with the
            # full-list read info while pushdown is still on (the worker
            # refuses creation once it is off), then freeze the seeds by
            # turning pushdown off for the span of the action
            for rel, ds in dups:
                ds.setReadInfo(None)
                ds.getOrCreateReadInfo(
                    _reflect(ds, "name"), rel.options(), rel.schema(), False
                )
            sess.conf.set(_CONF_KEY, "false")
            return orig(self, *args, **kwargs)
        except Exception:
            raise
        finally:
            sess.conf.set(_CONF_KEY, old)
            for _rel, ds in dups:
                ds.setReadInfo(None)

    wrapper.__pushdown_guard__ = True
    return wrapper


def install_pushdown_guard() -> None:
    """Idempotently wrap the classic DataFrame/DataFrameWriter action
    surface. Called by ``register_txn_source`` — the guard is what makes
    ``format("txn")``'s default-on pruning safe."""
    global _INSTALLED
    if _INSTALLED:
        return
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _CDF
        from pyspark.sql.readwriter import DataFrameWriter as _CW
    except ImportError:
        # Spark Connect has no classic action surface (and no local
        # relation cache to poison — plans replay through the server);
        # nothing to guard here.
        _INSTALLED = True
        return

    for name in _DF_ACTIONS:
        orig = getattr(_CDF, name, None)
        if orig is not None and not getattr(
            orig, "__pushdown_guard__", False
        ):
            setattr(_CDF, name, _guard(orig, lambda self: self))
    for name in _WRITER_ACTIONS:
        orig = getattr(_CW, name, None)
        if orig is not None and not getattr(
            orig, "__pushdown_guard__", False
        ):
            setattr(_CW, name, _guard(orig, lambda self: self._df))
    _INSTALLED = True
