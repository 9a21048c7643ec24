"""Custom Spark data sources (PySpark 4 Python DataSource API).

Lazy re-exports (PEP 562): the submodules here are ALSO imported inside
freshly spawned Python worker processes (the driver-side streaming
source runner and data-source planners unpickle their DataSource class
on startup, which imports its defining module — and with it this
package). An eager ``from .txn_source import ...`` dragged
``txn.py`` + pyarrow.parquet (~0.5 s cold) into every such spawn even
for sources that never touch the txn engine; the worker has a hard
10 s connect-back deadline, so spawn-time imports are pure risk
(guide §4: keep the Python boundary light)."""

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover - static typing only
    from .txn_source import TxnDataSource, register_txn_source

__all__ = ["TxnDataSource", "register_txn_source"]


def __getattr__(name: str):
    if name in __all__:
        from . import txn_source

        return getattr(txn_source, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
