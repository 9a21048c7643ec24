"""Custom Spark data sources (PySpark 4 Python DataSource API)."""

from .txn_source import TxnDataSource, register_txn_source

__all__ = ["TxnDataSource", "register_txn_source"]
