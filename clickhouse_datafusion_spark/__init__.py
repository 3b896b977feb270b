"""clickhouse_datafusion_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of GeorgeLeePatterson/clickhouse-datafusion.

The reference (/root/reference, Rust) is a federation/connector layer that plugs
ClickHouse into Apache DataFusion: catalog integration, query pushdown, a
``clickhouse(expr, 'Type')`` UDF surface, federation across sources, and writes/DDL
(see SURVEY.md §0).  This package re-expresses that capability contract
Spark-first:

- :mod:`.session`   — SparkSession construction tuned for OLAP (AQE, Arrow, UTC).
- :mod:`.catalog`   — the ``ClickHouseBuilder``/catalog analog: register parquet
  tables under a ``clickhouse.<db>.<table>`` namespace, aliasing, drop, refresh
  (reference: src/builders.rs, src/providers/catalog.rs).
- :mod:`.engine`    — the SQL/DataFrame front door: ``engine.sql(q)`` applies the
  ClickHouse-function rewrite + catalog-name normalization then delegates to
  Catalyst (reference: src/context.rs ClickHouseSessionContext).
- :mod:`.functions` — the ``clickhouse()/clickhouse_eval()/apply`` function
  family and the ClickHouse→Spark translation registry (reference: src/udfs/).
- :mod:`.sink`      — strict-schema, count-returning INSERT path
  (reference: src/sink.rs).
- :mod:`.operators` — beyond-reference large-scale pipeline operators: dedup,
  similarity search, text analysis, multimodal columns.
- :mod:`.streaming` — Structured Streaming extensions over event streams.

Everything here is built on public Apache Spark APIs only.
"""

from clickhouse_datafusion_spark.engine import ClickHouseSparkEngine
from clickhouse_datafusion_spark.catalog import ClickHouseCatalog
from clickhouse_datafusion_spark.session import get_spark

__all__ = ["ClickHouseSparkEngine", "ClickHouseCatalog", "get_spark"]
__version__ = "0.1.0"
