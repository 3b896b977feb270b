"""Concurrent-writer contention stress — the Spark analog of the
reference's max-concurrency / over-subscription write suites
(reference tests/e2e_stress.rs:69-239: 100k rows through 16 concurrent
writers into one table, count + integrity verified, no lost parts).

The reference stresses a connection POOL (writers can deadlock on pool
starvation); Spark's write path is task-parallel with no shared
connection resource, so deadlock is impossible by construction — these
tests provide the evidence-parity: N driver threads appending
concurrently into ONE table through both write paths, then exact
count/sum/distinct verification that no rows were lost or duplicated.
"""

from __future__ import annotations

import uuid
from concurrent.futures import ThreadPoolExecutor

import pytest
from pyspark.sql import functions as F

N_WRITERS = 16
ROWS_PER_WRITER = 6_250  # 16 × 6,250 = 100k rows, the reference's volume


def _writer_slice(spark, w: int):
    """Distinct id range per writer so lost/duplicated rows are detectable
    by count + sum + distinct — the reference's integrity check."""
    lo = w * ROWS_PER_WRITER
    return spark.range(lo, lo + ROWS_PER_WRITER).select(
        F.col("id").cast("bigint"),
        F.concat(F.lit("user_"), F.col("id")).alias("name"),
        (F.col("id") % 97).cast("double").alias("val"))


@pytest.fixture()
def stress_tbl(spark, engine):
    short = f"stress_{uuid.uuid4().hex[:10]}"
    name = f"main.{short}"
    engine.catalog.create_table(
        "main", short, "id BIGINT NOT NULL, name STRING, val DOUBLE")
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_concurrent_insert_into_catalog_table(spark, stress_tbl):
    """16 threads × 6,250 rows through sink.insert_into against ONE catalog
    table: every per-writer count row must report its slice, and the table
    must hold exactly the union (no lost parts, no duplicates)."""
    from clickhouse_datafusion_spark.sink import insert_into

    def write(w: int) -> int:
        res = insert_into(spark, _writer_slice(spark, w), stress_tbl,
                          write_concurrency=2)
        return res.collect()[0]["count"]

    with ThreadPoolExecutor(max_workers=N_WRITERS) as ex:
        counts = list(ex.map(write, range(N_WRITERS)))
    assert counts == [ROWS_PER_WRITER] * N_WRITERS

    total = N_WRITERS * ROWS_PER_WRITER
    agg = spark.table(stress_tbl).agg(
        F.count("*").alias("n"),
        F.countDistinct("id").alias("d"),
        F.sum("id").alias("s")).collect()[0]
    assert agg["n"] == total
    assert agg["d"] == total                      # no duplicated rows
    assert agg["s"] == total * (total - 1) // 2   # no lost/corrupt ids


def test_concurrent_connector_writers(spark, tmp_path):
    """16 threads appending through the clickhouse_native Arrow writer into
    one table directory: one part file per task, atomic-per-writer commit,
    exact union recovered on read-back."""
    from clickhouse_datafusion_spark.sources import (
        ensure_thread_session, register_clickhouse_source)

    register_clickhouse_source(spark)
    d = str(tmp_path / "stress_native")

    def write(w: int) -> None:
        # fresh py4j threads have no JVM active session → Python data
        # source lookup fails without this pin (see sources docstring)
        ensure_thread_session(spark)
        (_writer_slice(spark, w).coalesce(1)
         .write.format("clickhouse_native").option("path", d)
         .mode("append").save())

    with ThreadPoolExecutor(max_workers=N_WRITERS) as ex:
        list(ex.map(write, range(N_WRITERS)))

    back = spark.read.format("clickhouse_native").option("path", d).load()
    total = N_WRITERS * ROWS_PER_WRITER
    agg = back.agg(
        F.count("*").alias("n"),
        F.countDistinct("id").alias("d"),
        F.sum("id").alias("s")).collect()[0]
    assert agg["n"] == total
    assert agg["d"] == total
    assert agg["s"] == total * (total - 1) // 2
