"""The engine front door — analog of the reference's ``ClickHouseSessionContext``
(src/context.rs:248-304).

``engine.sql(q)``:
1. rewrites the ClickHouse function surface (``clickhouse()/clickhouse_eval()/
   apply()`` + backticked names + ``$x`` lambdas) into native Spark expressions
   with explicit casts — the Spark analog of the reference's analyzer running
   before TypeCoercion (src/context.rs:104-116);
2. strips the virtual ``clickhouse.`` catalog prefix from 3-part names
   (src/analyzer/function_pushdown.rs:460-473);
3. delegates to ``spark.sql`` — Catalyst provides parse/analyze/optimize
   (predicate pushdown, column pruning, limit pushdown, join selection, AQE),
   which is the built-in equivalent of the reference's federation pushdown
   (SURVEY §4.1).

INSERT statements return a one-row ``count`` DataFrame like the reference's
sink (src/sink.rs:202-210, examples/03_joins.rs:79-81) instead of Spark's
empty result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clickhouse_datafusion_spark.catalog import ClickHouseCatalog, DEFAULT_CATALOG
from clickhouse_datafusion_spark.functions.rewrite import rewrite_sql


class ClickHouseSparkEngine:
    def __init__(self, spark: SparkSession, catalog_name: str = DEFAULT_CATALOG,
                 coercion: bool = False):
        """``coercion=True`` is the analog of the reference's
        ``ClickHouseBuilder::with_coercion`` (src/builders.rs:128-135):
        declared-type mismatches coerce to NULL (TRY_CAST) instead of
        erroring."""
        self.spark = spark
        self.catalog = ClickHouseCatalog(spark, catalog_name)
        self._catalog_names = {catalog_name.lower()}
        self.coercion = coercion

    # ---------------------------------------------------------------------
    def rewrite(self, query: str) -> str:
        """Expose the SQL rewrite (for tests / EXPLAIN of the rewritten text)."""
        return rewrite_sql(query, self._catalog_names, coercion=self.coercion)

    def register_udf(self, name: str, fn, return_type) -> None:
        """Session-scoped scalar UDF registration (reference
        src/context.rs:98-99 register_udf passthrough)."""
        self.spark.udf.register(name, fn, return_type)

    def sql(self, query: str) -> DataFrame:
        rewritten = self.rewrite(query)
        if _is_insert(rewritten):
            return self._insert_sql(rewritten)
        return self.spark.sql(rewritten)

    def table(self, name: str) -> DataFrame:
        """Accepts ``db.table`` or ``clickhouse.db.table`` (prefix stripped)."""
        parts = name.split(".")
        if len(parts) == 3 and parts[0].lower() in self._catalog_names:
            name = ".".join(parts[1:])
        return self.spark.table(name)

    def explain_str(self, query: str, mode: str = "formatted") -> str:
        df = self.sql(query)
        return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), mode)

    # ---------------------------------------------------------------------
    def _insert_sql(self, rewritten: str) -> DataFrame:
        """Run INSERT, returning a single-row `count` DataFrame (UInt64 in the
        reference → BIGINT here), matching src/sink.rs:202-210 semantics."""
        from clickhouse_datafusion_spark import sink

        return sink.run_insert_sql(self.spark, rewritten)


def _is_insert(q: str) -> bool:
    s = q.lstrip()
    # skip leading comments
    while True:
        if s.startswith("--"):
            nl = s.find("\n")
            s = "" if nl == -1 else s[nl + 1:].lstrip()
        elif s.startswith("/*"):
            end = s.find("*/")
            s = "" if end == -1 else s[end + 2:].lstrip()
        else:
            break
    return s[:6].upper() == "INSERT"
