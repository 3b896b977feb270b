"""Data sources. The centerpiece is the ``clickhouse_native`` Python
DataSource — the Spark-4 analog of the reference's DataFusion
TableProvider/connector stack (reference src/sql.rs, src/connection.rs):
schema discovery, filter pushdown, partitioned scans, and an append writer
over a ClickHouse-style table layout.
"""

from clickhouse_datafusion_spark.sources.clickhouse_source import (
    ClickHouseNativeDataSource,
    ensure_thread_session,
    register_clickhouse_source,
)

__all__ = ["ClickHouseNativeDataSource", "ensure_thread_session",
           "register_clickhouse_source"]
