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

import re
import threading

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, Observation, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_WRITE_CONCURRENCY = 4


class SchemaValidationError(ValueError):
    """Raised when an inserted DataFrame does not match the target table."""


class OverwriteNotSupported(NotImplementedError):
    """Parity with the reference rejecting InsertOp::Overwrite."""


# Spark's FileOutputCommitter stages EVERY concurrent job writing a path
# under the same <path>/_temporary/0 directory; two jobs committing the same
# table concurrently delete each other's staged part files (lost parts /
# FileNotFoundException at commit). The reference never hits this because a
# ClickHouse INSERT is an independent server-side transaction
# (tests/e2e_stress.rs runs 16 truly-concurrent writers). Spark analog: a
# driver-side per-table mutex around the WHOLE write job — execution AND
# commit serialize for same-table writers, because insertInto stages into
# _temporary from the first task, so there is no commit-only window to
# lock without a staged-directory write path (the clickhouse_native
# connector has exactly that — one part_<uuid> file per task, no staging
# dir — and therefore takes no lock; route truly-concurrent same-table
# load through it). Task parallelism inside each job is untouched and
# different tables proceed concurrently; the lock is process-local, so
# multi-DRIVER writers sharing a path still need an external committer.
_TABLE_WRITE_LOCKS: dict[str, threading.Lock] = {}
_LOCKS_GUARD = threading.Lock()


def _table_write_lock(table: str) -> threading.Lock:
    with _LOCKS_GUARD:
        return _TABLE_WRITE_LOCKS.setdefault(table.lower(), threading.Lock())


def _count_df(spark: SparkSession, n: int) -> DataFrame:
    return spark.createDataFrame(
        [Row(count=n)], T.StructType([T.StructField("count", T.LongType(), False)]))


# Logical nodes that (can) change the partitioning between the file scan
# and the write, invalidating the file-split partition estimate.
_RESHUFFLE_NODES = ("Aggregate", "Join", "Window", "Sort", "Distinct",
                    "Deduplicate", "Repartition", "GlobalLimit", "Expand")


def _plan_may_reshuffle(df: DataFrame) -> bool:
    """True when the analyzed logical plan contains a node that may insert
    an exchange (so the scan-split estimate no longer predicts the final
    partition count). Reads the ALREADY-ANALYZED logical plan — no
    physical re-planning, unlike an ``df.rdd`` probe."""
    try:
        s = df._jdf.queryExecution().analyzed().toString()  # noqa: SLF001
    except Exception:
        return True
    return any(n in s for n in _RESHUFFLE_NODES)


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
    except AnalysisException:
        # temp views / non-catalog relations have no TBLPROPERTIES —
        # the schema-flag columns above are the whole answer there
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


_NULL_GUARD_MARK = "nullability violation"


def _null_guarded(col_name: str, dtype: T.DataType):
    """Column expression that errors at *write time* on a NULL in a
    non-nullable field — the Spark analog of the reference's per-batch
    nullability check inside the write stream (src/sink.rs:143-176).
    A task failure aborts the job before the file commit, so no bad data
    lands, and the input is never scanned a second time."""
    msg = (f"{_NULL_GUARD_MARK}: field {col_name} is non-nullable but input "
           f"contains null(s)")
    return (F.when(F.col(col_name).isNotNull(), F.col(col_name))
            .otherwise(F.raise_error(F.lit(msg)).cast(dtype))
            .alias(col_name))


def insert_into(spark: SparkSession, df: DataFrame, table: str,
                write_concurrency: int = DEFAULT_WRITE_CONCURRENCY,
                overwrite: bool = False) -> DataFrame:
    """Append ``df`` into catalog table ``table`` and return a count DataFrame.

    Single-pass: the row count comes from ``df.observe`` on the write job and
    nullability is enforced inside the same job (``_null_guarded``), so the
    input plan executes exactly once — the reference likewise folds counts
    from the write stream itself (src/sink.rs:202-210) instead of re-running
    the input.
    """
    if overwrite:
        raise OverwriteNotSupported(
            "overwrite not supported (reference parity: "
            "src/providers/table.rs:148-152)")
    target_schema = spark.table(table).schema
    validate_schema(df, target_schema)
    non_nullable = {c.lower()
                    for c in _not_null_columns(spark, table, target_schema)}
    # Statically non-nullable inputs cannot violate the constraint — skip
    # the per-row CASE WHEN guard for them so a clean pipeline pays zero
    # guard cost (the data-level check only matters when Catalyst cannot
    # prove non-nullness).
    src_nullable = {f.name.lower(): f.nullable for f in df.schema.fields}
    # Reorder columns by name to match the table; one writer task per
    # concurrency slot (reference buffer_unordered(write_concurrency)).
    ordered = df.select([
        _null_guarded(f.name, f.dataType)
        if (f.name.lower() in non_nullable
            and src_nullable.get(f.name.lower(), True))
        else F.col(f.name)
        for f in target_schema.fields])
    obs = Observation()
    observed = ordered.observe(obs, F.count(F.lit(1)).alias("rows"))
    # Bounding writer parallelism does not require a shuffle: coalesce
    # collapses partitions in place when the input already has ≥n, which at
    # 100 TB deletes a full exchange of the inserted data; repartition only
    # when we must fan OUT to reach the requested concurrency.
    if write_concurrency:
        # Partition probe = file-split estimate off the pre-observe plan
        # (projection and observe preserve partitioning) — NOT df.rdd,
        # whose RDD conversion re-plans the query. The estimate only
        # describes the SCAN, so it is trusted (→ cheap coalesce) only for
        # scan/project-shaped inputs; any shuffle-inducing node between
        # scan and write (agg/join/AQE-coalesced exchange) can leave far
        # fewer partitions than the file count says, and coalesce can only
        # shrink — it would silently under-deliver the requested write
        # concurrency (r4 advice). Those plans, and None estimates
        # (in-memory VALUES inserts), take the safe repartition: such
        # inputs already shuffled at least once, so one more exchange of
        # the insert set is marginal.
        from clickhouse_datafusion_spark.plans.explain import (
            estimated_scan_partitions)

        cur = estimated_scan_partitions(ordered)
        if (cur is not None and cur >= write_concurrency
                and not _plan_may_reshuffle(ordered)):
            writer = observed.coalesce(write_concurrency)
        else:
            writer = observed.repartition(write_concurrency)
    else:
        writer = observed
    # v1 write path (works for parquet catalog tables); positional resolution,
    # hence the explicit column reorder above.
    try:
        with _table_write_lock(table):
            writer.write.insertInto(table, overwrite=False)
    except Exception as e:  # surface the in-job null guard as a typed error
        m = re.search(
            rf"{_NULL_GUARD_MARK}: field \S+ is non-nullable but input "
            rf"contains null\(s\)", str(e))
        if m:
            raise SchemaValidationError(m.group(0)) from e
        raise
    return _count_df(spark, obs.get["rows"])


def run_insert_sql(spark: SparkSession, insert_sql: str) -> DataFrame:
    """Execute an INSERT statement, returning the reference-style count row.

    Spark's ``INSERT`` returns an empty DataFrame. For the common
    ``INSERT INTO <t> <query>`` shape we run ``<query>`` ourselves with an
    attached ``Observation`` and write it positionally (identical semantics
    to SQL INSERT), so the count comes from the single write job. Statements
    we don't rewrite (column lists, PARTITION specs) fall back to
    ``spark.sql`` plus a metadata-backed count diff.
    """
    split = _split_insert(insert_sql)
    if split is not None:
        table, query, overwrite = split
        src = spark.sql(query)
        obs = Observation()
        observed = src.observe(obs, F.count(F.lit(1)).alias("rows"))
        with _table_write_lock(table):
            observed.write.insertInto(table, overwrite=overwrite)
        return _count_df(spark, obs.get["rows"])
    table = _parse_insert_target(insert_sql)
    before = spark.table(table).count() if table else None
    spark.sql(insert_sql)
    if table is None:
        return _count_df(spark, -1)
    after = spark.table(table).count()
    return _count_df(spark, after - before)


_INSERT_HEAD_RE = re.compile(
    r"^\s*insert\s+(into|overwrite)\s+(?:table\s+)?"
    r"(`[^`]+`(?:\s*\.\s*`[^`]+`)*|[\w.$]+)\s*",
    re.IGNORECASE)


def _split_insert(sql: str) -> tuple[str, str, bool] | None:
    """Split ``INSERT INTO|OVERWRITE [TABLE] <name> <query>`` into
    (table, query, overwrite). Returns None for shapes with a column list or
    PARTITION spec — those keep Spark's own INSERT path."""
    m = _INSERT_HEAD_RE.match(sql)
    if not m:
        return None
    rest = sql[m.end():].lstrip()
    up = rest.upper()
    if not rest or rest.startswith("(") or up.startswith("PARTITION"):
        return None
    if not (up.startswith("SELECT") or up.startswith("VALUES")
            or up.startswith("WITH") or up.startswith("TABLE")
            or up.startswith("FROM")):
        return None
    table = _normalize_target(m.group(2))
    return table, rest, m.group(1).lower() == "overwrite"


def _normalize_target(raw: str) -> str:
    """Normalize a (possibly backticked, possibly ``a . b``-spaced) multipart
    table name: trim whitespace around the dots BETWEEN parts only —
    whitespace inside backticked segments is part of the identifier, so
    ```my table``` keeps its backticks (and its space) while ```t``` is
    unquoted to ``t``."""
    parts: list[str] = []
    buf = ""
    in_bt = False
    for ch in raw:
        if ch == "`":
            in_bt = not in_bt
            buf += ch
        elif ch == "." and not in_bt:
            parts.append(buf.strip())
            buf = ""
        else:
            buf += ch
    parts.append(buf.strip())
    out = []
    for p in parts:
        if p.startswith("`") and p.endswith("`") and len(p) >= 2:
            inner = p[1:-1]
            out.append(inner if re.fullmatch(r"[\w$]+", inner) else f"`{inner}`")
        else:
            out.append(p)
    return ".".join(out)


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
