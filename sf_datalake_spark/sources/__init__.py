"""Custom data sources (Spark 4 Python DataSource API)."""

from sf_datalake_spark.sources.recordlog import (
    RecordLogDataSource,
    read_recordlog_records,
    register_recordlog,
    write_recordlog,
)

__all__ = [
    "RecordLogDataSource",
    "read_recordlog_records",
    "register_recordlog",
    "write_recordlog",
]
