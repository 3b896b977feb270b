"""The ClickHouse function surface (reference src/udfs/, SURVEY §2.7).

- :mod:`.registry` — ClickHouse→Spark scalar-function translation table.
- :mod:`.rewrite`  — SQL-string rewriter: ``clickhouse(expr,'Type')``,
  ``clickhouse_eval('raw','Type')``, higher-order ``arrayMap($x, ...)`` forms,
  backticked ClickHouse names, catalog-prefix stripping.
- :mod:`.chfns`    — DataFrame-side helpers mirroring the SQL surface.
"""

from clickhouse_datafusion_spark.functions.rewrite import (
    rewrite_sql,
    UnknownClickHouseFunction,
)
from clickhouse_datafusion_spark.functions.chfns import ch, ch_array_map, ch_array_filter, ch_array_exists

__all__ = [
    "rewrite_sql",
    "UnknownClickHouseFunction",
    "ch",
    "ch_array_map",
    "ch_array_filter",
    "ch_array_exists",
]
