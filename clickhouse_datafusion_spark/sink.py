"""Write path — analog of ``ClickHouseDataSink`` (reference src/sink.rs).

Reference semantics reproduced here:
- strict pre-write schema validation with distinct error categories: field
  count mismatch, missing field by name, type mismatch, nullability violation
  (src/sink.rs:46-81, 143-176; tests/e2e.rs:1590-1650);
- ``INSERT`` returns a one-row, one-column ``count`` result (src/sink.rs:202-210,
  examples/03_joins.rs:79-81) — Spark normally returns an empty DataFrame;
- configurable write concurrency, default 4 (src/connection.rs:45-57): the
  reference fans batches out over ``buffer_unordered(n)``; the Spark analog is
  one writer task per partition, so we ``repartition(n)`` before the write;
- ``InsertOp::Overwrite`` rejected (src/providers/table.rs:148-152).

Nullability is validated against the *data* (null-count per non-nullable
target field) rather than the DataFrame's static nullable flags, because Spark
marks most derived columns nullable even when no nulls can occur; the
reference's per-batch check is likewise a data-level check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_WRITE_CONCURRENCY = 4


class SchemaValidationError(ValueError):
    """Raised when an inserted DataFrame does not match the target table."""


class OverwriteNotSupported(NotImplementedError):
    """Parity with the reference rejecting InsertOp::Overwrite."""


def _count_df(spark: SparkSession, n: int) -> DataFrame:
    return spark.createDataFrame(
        [Row(count=n)], T.StructType([T.StructField("count", T.LongType(), False)]))


def validate_schema(df: DataFrame, target_schema: T.StructType) -> None:
    """Strict name/type validation (reference src/sink.rs:46-81)."""
    src = {f.name.lower(): f for f in df.schema.fields}
    tgt = {f.name.lower(): f for f in target_schema.fields}
    if len(df.schema.fields) != len(target_schema.fields):
        raise SchemaValidationError(
            f"field count mismatch: input has {len(df.schema.fields)} fields, "
            f"table has {len(target_schema.fields)}")
    for name, tf in tgt.items():
        if name not in src:
            raise SchemaValidationError(f"missing field: {tf.name}")
        sf = src[name]
        if sf.dataType != tf.dataType:
            raise SchemaValidationError(
                f"type mismatch for field {tf.name}: input "
                f"{sf.dataType.simpleString()}, table {tf.dataType.simpleString()}")


def _not_null_columns(spark: SparkSession, table: str,
                      target_schema: T.StructType) -> list[str]:
    """NOT NULL columns of a table: schema flags plus the
    ``clickhouse.not_null`` property (Spark drops NOT NULL from parquet
    catalog-table schemas, so catalog.create_table records it there)."""
    cols = [f.name for f in target_schema.fields if not f.nullable]
    try:
        rows = spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
        props = {r["key"]: r["value"] for r in rows}
        cols += [c for c in props.get("clickhouse.not_null", "").split(",") if c]
    except Exception:
        pass
    return sorted(set(cols))


def validate_no_nulls(df: DataFrame, target_schema: T.StructType,
                      non_nullable: list[str] | None = None) -> None:
    """Data-level nullability validation (reference src/sink.rs:143-176)."""
    if non_nullable is None:
        non_nullable = [f.name for f in target_schema.fields if not f.nullable]
    present = {f.name.lower() for f in df.schema.fields}
    checks = [f for f in non_nullable if f.lower() in present]
    if not checks:
        return
    counts = df.select(
        [F.count(F.when(F.col(c).isNull(), 1)).alias(c) for c in checks]
    ).collect()[0]
    for c in checks:
        if counts[c] > 0:
            raise SchemaValidationError(
                f"nullability violation: field {c} is non-nullable but input "
                f"contains {counts[c]} null(s)")


def insert_into(spark: SparkSession, df: DataFrame, table: str,
                write_concurrency: int = DEFAULT_WRITE_CONCURRENCY,
                overwrite: bool = False) -> DataFrame:
    """Append ``df`` into catalog table ``table`` and return a count DataFrame."""
    if overwrite:
        raise OverwriteNotSupported(
            "overwrite not supported (reference parity: "
            "src/providers/table.rs:148-152)")
    target_schema = spark.table(table).schema
    validate_schema(df, target_schema)
    validate_no_nulls(df, target_schema,
                      _not_null_columns(spark, table, target_schema))
    n = df.count()
    # Reorder columns by name to match the table; one writer task per
    # concurrency slot (reference buffer_unordered(write_concurrency)).
    ordered = df.select([F.col(f.name) for f in target_schema.fields])
    writer = ordered.repartition(write_concurrency) if write_concurrency else ordered
    # v1 write path (works for parquet catalog tables); positional resolution,
    # hence the explicit column reorder above.
    writer.write.insertInto(table, overwrite=False)
    return _count_df(spark, n)


def run_insert_sql(spark: SparkSession, insert_sql: str) -> DataFrame:
    """Execute an INSERT statement, returning the reference-style count row.

    Spark's ``INSERT`` returns an empty DataFrame; we diff a cheap
    metadata-backed ``count(*)`` before/after to report rows written.
    """
    table = _parse_insert_target(insert_sql)
    before = spark.table(table).count() if table else None
    spark.sql(insert_sql)
    if table is None:
        return _count_df(spark, -1)
    after = spark.table(table).count()
    return _count_df(spark, after - before)


def _parse_insert_target(sql: str) -> str | None:
    """Extract the target table name from INSERT INTO/OVERWRITE <name>."""
    toks = sql.replace("\n", " ").split()
    up = [t.upper() for t in toks]
    try:
        i = up.index("INSERT")
    except ValueError:
        return None
    j = i + 1
    if j < len(up) and up[j] in ("INTO", "OVERWRITE"):
        j += 1
    if j < len(up) and up[j] == "TABLE":
        j += 1
    if j >= len(toks):
        return None
    name = toks[j]
    # strip trailing ( or (cols...) fragment glued to the name
    for stop in "(;":
        k = name.find(stop)
        if k != -1:
            name = name[:k]
    return name.replace("`", "") or None
