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
entry points, plus ``DataFrameWriterV2`` terminals
(``df.writeTo(...).append()`` …), ``MergeIntoWriter.merge`` and
``DataStreamWriter.start``/``toTable``. Before delegating, it walks the
acted-on frame's ANALYZED plan leaves (a handful of py4j calls) and
collects every Python-DataSource relation:

* **Always**: reset each relation's cached read info (public
  ``setReadInfo(null)``) BEFORE the action, and again AFTER it in a
  ``finally`` — a filtered plan never outlives the action that planned
  it, so even paths outside the wrapped surface (``df.rdd``, direct
  ``_jdf`` calls, a micro-batch replanning a stream-static join) can at
  worst observe an empty cache and plan fresh, never a stale pruned
  list. The action itself plans its own pushdown from clean state —
  filtered queries still prune. Kills mode 1.
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
surface (``df.rdd``, direct ``_jdf`` calls) plan from a clean cache as
long as they don't run concurrently inside another thread's wrapped
filtered action (the post-action reset covers the sequential case);
``option("pushdown", "false")`` gives those a query-independent plan
unconditionally.

The reflection (``PythonTable.ds`` / ``PythonDataSourceV2.name`` are
private, read via ``getDeclaredField``) stays legal under JDK 17 because
spark-sql lives on the classpath (unnamed module, open by default).
"""

from __future__ import annotations

import functools

_INSTALLED = False
_CONF_KEY = "spark.sql.python.filterPushdown.enabled"

# ---------------------------------------------------------------------------
# Fast path (r16 verdict task 8): the guard's analyzed-plan leaf walk costs
# ~0.4 ms/leaf of py4j round-trips per NEW DataFrame acted on — pure waste
# on the relational lanes that never touch a Python data source. A Python
# relation can only enter a plan through a reader/readStream ``load`` whose
# format names a REGISTERED Python data source, so a process-level count of
# such loads is a sound skip condition: while it is zero, no plan anywhere
# in the process can contain a Python relation and the walk (and the cache
# resets) can be skipped outright. The counter is monotonic — once a Python
# load happens the guard is permanently thorough again — so the skip can
# never hide a relation: the load that creates one bumps the counter
# before any action on the resulting frame can run (same-thread program
# order; cross-thread handoff of a DataFrame implies the usual
# happens-before edge at the handoff).
_PY_SOURCE_NAMES: set[str] = set()
_PY_LOADS = 0


def _note_registration(name: str) -> None:
    _PY_SOURCE_NAMES.add(str(name).lower())


def _note_load(fmt) -> None:
    global _PY_LOADS
    if fmt is not None and str(fmt).lower() in _PY_SOURCE_NAMES:
        _PY_LOADS += 1

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
# DataFrameWriterV2 terminal methods (df.writeTo(...).append() etc.)
_WRITER_V2_ACTIONS = (
    "create",
    "replace",
    "createOrReplace",
    "append",
    "overwrite",
    "overwritePartitions",
)
# DataStreamWriter: start/toTable plan the query (incl. any txn batch
# relation on the static side of a stream-static join). The guard resets
# before planning and again after, so the stream's initial plan is fresh
# and nothing filtered is left behind; a micro-batch replanning
# concurrently with ANOTHER thread's wrapped filtered action remains a
# documented race (same class as the existing thread caveats above).
_STREAM_WRITER_ACTIONS = ("start", "toTable")


def _reflect(obj, field: str):
    f = obj.getClass().getDeclaredField(field)
    f.setAccessible(True)
    return f.get(obj)


# java.lang.reflect.Field handles, keyed (gateway, class fqn, field):
# resolving one costs 3 py4j roundtrips (getDeclaredField +
# setAccessible on top of the getClass the walk already pays) — the
# SAME PythonTable.ds field every time. A Field is a stateless handle;
# f.get(obj) re-reads the live value each call, so caching the handle
# changes nothing observable.
_FIELD_CACHE: dict = {}


def _field_get(obj, cls, cls_name: str, field: str):
    key = (id(obj._gateway_client), cls_name, field)
    f = _FIELD_CACHE.get(key)
    if f is None:
        f = cls.getDeclaredField(field)
        f.setAccessible(True)
        _FIELD_CACHE[key] = f
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
        tcls = t.getClass()
        tname = tcls.getName()
        if not tname.endswith(".python.PythonTable"):
            continue
        out.append((leaf, _field_get(t, tcls, tname, "ds")))
    return out


def reset_python_scan_caches(df) -> list:
    """Null the cached read info of every Python-DataSource relation in
    ``df``'s analyzed plan. Returns ALL (relation, ds) pairs found (the
    caller decides what to do with duplicates). Never raises — the guard
    must not break an action it cannot help."""
    try:
        rels = _python_relations(df)
        for _rel, ds in rels:
            ds.setReadInfo(None)
        return rels
    except Exception:  # noqa: BLE001
        return []


def _has_dup(rels) -> bool:
    if len(rels) < 2:  # the common case: no hashCode roundtrips
        return False
    seen: set[int] = set()
    for _rel, ds in rels:
        h = ds.hashCode()  # identity hash: not overridden
        if h in seen:
            return True
        seen.add(h)
    return False


def _cached_relations(df) -> list:
    """The leaf walk, cached per python DataFrame object. A DataFrame
    wraps one immutable analyzed plan, so its Python-relation set never
    changes — repeated actions on the same frame (loops, notebooks) pay
    the py4j walk once.

    MEASURED (r10 HEAD, local[32], parquet table, 100-call average):
    the walk costs 0.93 ms on a 1-leaf plan and 21.1 ms on a 50-leaf
    union (~0.4 ms/leaf, pure py4j round-trips), against action costs
    of 123 ms and 1.67 s for the same counts — <1.3% overhead even on
    the pathological 50-scan plan, and ~0 when this cache hits.

    Zero-load fast path: while no Python-source ``load`` has happened
    in this process (``_PY_LOADS == 0``) no plan can contain a Python
    relation, so return [] without the walk (and without caching —
    the df's verdict is already final either way, but not caching
    keeps the skip logic trivially monotone-safe)."""
    if _PY_LOADS == 0:
        return []
    try:
        rels = df.__dict__.get("_pdg_rels")
        if rels is None:
            rels = _python_relations(df)
            df.__dict__["_pdg_rels"] = rels
        return rels
    except Exception:  # noqa: BLE001
        return []


def _guard(orig, get_df):
    @functools.wraps(orig)
    def wrapper(self, *args, **kwargs):
        try:
            df = get_df(self)
        except Exception:  # noqa: BLE001
            return orig(self, *args, **kwargs)
        rels = _cached_relations(df)
        if not rels:
            return orig(self, *args, **kwargs)
        try:
            for _rel, ds in rels:
                ds.setReadInfo(None)
        except Exception:  # noqa: BLE001
            return orig(self, *args, **kwargs)
        try:
            if not _has_dup(rels):
                return orig(self, *args, **kwargs)
            sess = df.sparkSession
            old = sess.conf.get(_CONF_KEY, "true")
            try:
                # pre-seed EVERY python relation in this plan with the
                # full-list read info while pushdown is still on (the
                # worker refuses creation once it is off), then freeze
                # the seeds by turning pushdown off for the action span
                for rel, ds in rels:
                    ds.setReadInfo(None)
                    ds.getOrCreateReadInfo(
                        _reflect(ds, "name"),
                        rel.options(),
                        rel.schema(),
                        False,
                    )
                sess.conf.set(_CONF_KEY, "false")
                return orig(self, *args, **kwargs)
            finally:
                sess.conf.set(_CONF_KEY, old)
        finally:
            # a filtered plan must never outlive the action that planned
            # it: paths outside the wrapped surface (df.rdd, _jdf, a
            # micro-batch replanning a stream-static join) would
            # otherwise replay this action's pruned read list
            try:
                for _rel, ds in rels:
                    ds.setReadInfo(None)
            except Exception:  # noqa: BLE001
                pass

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

    # --- load counting for the zero-load fast path -----------------------
    # Python relations are born in reader/readStream ``load`` calls whose
    # format names a registered Python source; count those so the guard
    # can skip its plan walk while none have happened. Registration is
    # tracked at DataSourceRegistration.register (covers third-party
    # sources too); our own register_* helpers also record their names
    # directly, covering registrations that predate this install.
    try:
        from pyspark.sql.datasource import (
            DataSourceRegistration as _DSR,
        )

        if not getattr(_DSR.register, "__pushdown_guard__", False):
            _orig_reg = _DSR.register

            @functools.wraps(_orig_reg)
            def _reg(self, dataSource):
                try:
                    _note_registration(dataSource.name())
                except Exception:  # noqa: BLE001
                    pass
                return _orig_reg(self, dataSource)

            _reg.__pushdown_guard__ = True
            _DSR.register = _reg
    except ImportError:
        pass

    def _wrap_reader(cls) -> None:
        if not getattr(cls.format, "__pushdown_guard__", False):
            _ofmt = cls.format

            @functools.wraps(_ofmt)
            def _fmt(self, source):
                self._pdg_fmt = source
                return _ofmt(self, source)

            _fmt.__pushdown_guard__ = True
            cls.format = _fmt
        if not getattr(cls.load, "__pushdown_guard__", False):
            _oload = cls.load

            @functools.wraps(_oload)
            def _load(self, *a, **kw):
                fmt = kw.get("format")
                if fmt is None and len(a) >= 2:
                    fmt = a[1]
                if fmt is None:
                    fmt = getattr(self, "_pdg_fmt", None)
                _note_load(fmt)
                return _oload(self, *a, **kw)

            _load.__pushdown_guard__ = True
            cls.load = _load

    global _PY_LOADS
    try:
        from pyspark.sql.readwriter import DataFrameReader as _DFR

        _wrap_reader(_DFR)
    except Exception:  # noqa: BLE001 - counting is best-effort…
        _PY_LOADS += 1  # …but skipping must stay sound: disable it
    try:
        from pyspark.sql.streaming.readwriter import (
            DataStreamReader as _DSRD,
        )

        _wrap_reader(_DSRD)
    except Exception:  # noqa: BLE001
        _PY_LOADS += 1
    if _PY_SOURCE_NAMES:
        # a Python source was registered BEFORE load counting existed
        # (register_replay_source without any guard-installing source):
        # loads may already have happened unseen — disable the fast
        # path for this process rather than risk skipping a real walk
        _PY_LOADS += 1

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

    try:
        from pyspark.sql.readwriter import DataFrameWriterV2 as _CW2

        for name in _WRITER_V2_ACTIONS:
            orig = getattr(_CW2, name, None)
            if orig is not None and not getattr(
                orig, "__pushdown_guard__", False
            ):
                setattr(_CW2, name, _guard(orig, lambda self: self._df))
    except ImportError:
        pass

    try:
        # MergeIntoWriter does not retain the source DataFrame; stash it
        # at construction so merge() (the action, possibly much later)
        # can re-walk the CURRENT plan leaves.
        from pyspark.sql.merge import MergeIntoWriter as _MIW

        if not getattr(_MIW.__init__, "__pushdown_guard__", False):
            _orig_init = _MIW.__init__

            @functools.wraps(_orig_init)
            def _init(self, df, *a, **kw):
                self._pushdown_guard_df = df
                _orig_init(self, df, *a, **kw)

            _init.__pushdown_guard__ = True
            _MIW.__init__ = _init
        orig = getattr(_MIW, "merge", None)
        if orig is not None and not getattr(
            orig, "__pushdown_guard__", False
        ):
            _MIW.merge = _guard(
                orig, lambda self: self._pushdown_guard_df
            )
    except ImportError:
        pass

    try:
        from pyspark.sql.streaming.readwriter import (
            DataStreamWriter as _DSW,
        )

        for name in _STREAM_WRITER_ACTIONS:
            orig = getattr(_DSW, name, None)
            if orig is not None and not getattr(
                orig, "__pushdown_guard__", False
            ):
                setattr(_DSW, name, _guard(orig, lambda self: self._df))
    except ImportError:
        pass
    _INSTALLED = True
