"""r12 property suite (r11 verdict task 7): the streamed federated
write path under adversarial concurrency, timezone, and batch-boundary
inputs. Reference anchors: tests/e2e_stress.rs:241-250 (multi-client
interleaved writes through one pool), src/sink.rs:129-211 (streaming
append contract)."""

from __future__ import annotations

import threading

import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhouse_datafusion_spark.sources.remote_engine import RemoteEngine
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def fed(spark):
    from clickhouse_datafusion_spark.engine import ClickHouseSparkEngine

    eng = ClickHouseSparkEngine(spark)
    remote = RemoteEngine(pool_size=4)
    remote.register_parquet_dir(SF_SMOKE, tables=["orders", "customer"])
    eng.attach_remote(remote, db="remote", local_twin_dir=SF_SMOKE)
    return eng, remote


# -- 1. concurrent insert_arrow_batches callers sharing ONE pool -------

def _batches(lo: int, n_batches: int, rows_per: int):
    for i in range(n_batches):
        base = lo + i * rows_per
        yield pa.record_batch(
            [pa.array(range(base, base + rows_per), type=pa.int64())],
            names=["k"])


def test_concurrent_batch_writers_two_tables_one_pool():
    """Two threads stream interleaved batch appends into TWO tables
    through ONE shared pool (pool_size=2, each caller asking for 4
    workers = 8 writers over 2 cursors): no deadlock, no lost or
    cross-wired rows, exact disjoint key sets per table — the
    reference's multi-client stress analog (e2e_stress.rs:241-250)."""
    remote = RemoteEngine(pool_size=2)
    remote.create_table("cc_a", "k BIGINT")
    remote.create_table("cc_b", "k BIGINT")
    errs: list[Exception] = []
    counts = {}

    def writer(table, lo):
        try:
            counts[table] = remote.insert_arrow_batches(
                table, _batches(lo, 40, 25), write_concurrency=4)
        except Exception as e:  # pragma: no cover - fails the assert
            errs.append(e)

    try:
        ts = [threading.Thread(target=writer, args=("cc_a", 0)),
              threading.Thread(target=writer, args=("cc_b", 1_000_000))]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
        assert not errs, errs
        assert counts == {"cc_a": 1000, "cc_b": 1000}
        for table, lo in (("cc_a", 0), ("cc_b", 1_000_000)):
            got = remote.execute(
                f"SELECT CAST(count(*) AS BIGINT) AS n, "
                f"CAST(min(k) AS BIGINT) AS mn, "
                f"CAST(max(k) AS BIGINT) AS mx, "
                f"CAST(count(DISTINCT k) AS BIGINT) AS d FROM {table}")
            n, mn, mx, d = (got.column(i)[0].as_py() for i in range(4))
            assert (n, mn, mx, d) == (1000, lo, lo + 999, 1000)
    finally:
        remote.drop_table("cc_a")
        remote.drop_table("cc_b")


def test_concurrent_writers_same_table_exact_union():
    """Both callers target the SAME table: the union of both key
    ranges lands exactly once each (append-only, no lost update)."""
    remote = RemoteEngine(pool_size=2)
    remote.create_table("cc_s", "k BIGINT")
    errs: list[Exception] = []

    def writer(lo):
        try:
            remote.insert_arrow_batches(
                "cc_s", _batches(lo, 20, 50), write_concurrency=3)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    try:
        ts = [threading.Thread(target=writer, args=(lo,))
              for lo in (0, 500_000)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
        assert not errs, errs
        got = remote.execute(
            "SELECT CAST(count(*) AS BIGINT) AS n, "
            "CAST(count(DISTINCT k) AS BIGINT) AS d FROM cc_s")
        assert (got.column(0)[0].as_py(),
                got.column(1)[0].as_py()) == (2000, 2000)
    finally:
        remote.drop_table("cc_s")


# -- 2. TIMESTAMP (instant) and TIMESTAMP_NTZ (wall-clock) through the
#       write spool under a NON-UTC session --------------------------

def test_write_spool_timestamp_semantics_non_utc(fed, spark):
    """The spool preserves the SEMANTIC of each timestamp flavor under
    a non-UTC session (the r11 tz gate covers reads; writes carry
    instants too — r11 verdict task 7):

    - TIMESTAMP (LTZ) columns carry INSTANTS. The remote stores the
      UTC rendering regardless of session tz (parquet normalizes to
      UTC), so a written instant reads back as the same instant — the
      naive remote value must equal the UTC rendering, NOT the session
      rendering.
    - TIMESTAMP_NTZ columns carry WALL-CLOCK fields. The remote must
      store the literal fields unshifted — identical under any
      session tz."""
    eng, remote = fed
    remote.create_table("tzw_t", "k BIGINT, ev TIMESTAMP, evn TIMESTAMP")
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        # TIMESTAMP '...' parses in the session tz: 12:00 EST = 17:00 UTC
        src = spark.sql(
            "SELECT CAST(id AS BIGINT) AS k, "
            "TIMESTAMP '2001-01-15 12:00:00.123456' AS ev, "
            "TIMESTAMP_NTZ '2001-01-15 12:00:00.123456' AS evn, "
            "log(id + 1) AS junk FROM range(2)")
        src.createOrReplaceTempView("tzw_src")
        eng.sql("INSERT INTO clickhouse.remote.tzw_t "
                "SELECT k, ev, evn FROM tzw_src WHERE log(k + 1) >= 0")
        assert eng.last_remote_insert == "arrow-stream"
        rows = remote.execute(
            "SELECT ev, evn FROM tzw_t ORDER BY ev LIMIT 1")
        ev, evn = (str(rows.column(0)[0]), str(rows.column(1)[0]))
        assert ev == "2001-01-15 17:00:00.123456"     # instant, UTC form
        assert evn == "2001-01-15 12:00:00.123456"    # wall-clock, as-is
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
        remote.drop_table("tzw_t")
        spark.catalog.dropTempView("tzw_src")


def test_write_then_read_roundtrip_is_instant_faithful(fed, spark):
    """Round trip under non-UTC: INSERT an instant, read it back
    through the seam (or its local fallback) — the value the user
    sees equals the value they wrote, independent of the remote's
    naive storage rendering."""
    from pyspark.sql import functions as F

    eng, remote = fed
    remote.create_table("tzr_t", "k BIGINT, ev TIMESTAMP")
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        src = spark.sql(
            "SELECT CAST(1 AS BIGINT) AS k, "
            "TIMESTAMP '2001-01-15 12:00:00' AS ev, log(2) AS junk")
        src.createOrReplaceTempView("tzr_src")
        eng.sql("INSERT INTO clickhouse.remote.tzr_t "
                "SELECT k, ev FROM tzr_src WHERE log(k + 1) >= 0")
        # read the instant back seam-level (Arrow, tz-naive = UTC form)
        micros = remote.execute(
            "SELECT epoch_us(ev) AS us FROM tzr_t").column(0)[0].as_py()
        want = src.select(
            F.unix_micros("ev").alias("us")).first()["us"]
        assert micros == want
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
        remote.drop_table("tzr_t")
        spark.catalog.dropTempView("tzr_src")


# -- 3. adversarial write_batch_rows boundaries ------------------------

@given(batch_rows=st.sampled_from([1, 7, 100_000_000]),
       wc=st.sampled_from([1, 8]))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_write_batch_rows_boundaries(fed, spark, batch_rows, wc):
    """The federated streamed INSERT is exact at the batch-size
    extremes: 1-row batches (hundreds of pool round-trips), a tiny
    odd size, and one giant batch larger than the source (single
    append), crossed with 1 and 8 workers over the pool of 4 (over-
    subscribed: pool waits, no deadlock, no timeout)."""
    eng, remote = fed
    prev_b, prev_w = eng.write_batch_rows, eng.write_concurrency
    remote.create_table("bb_t", "k BIGINT")
    try:
        eng.write_batch_rows, eng.write_concurrency = batch_rows, wc
        eng.sql("INSERT INTO clickhouse.remote.bb_t "
                "SELECT CAST(o_orderkey AS BIGINT) FROM "
                "clickhouse.remote.orders WHERE log(o_orderkey + 1) >= 0 "
                "AND o_orderkey < 700")
        got = remote.execute(
            "SELECT CAST(count(*) AS BIGINT) AS n, "
            "CAST(count(DISTINCT k) AS BIGINT) AS d FROM bb_t")
        n, d = got.column(0)[0].as_py(), got.column(1)[0].as_py()
        want = spark.read.parquet(f"{SF_SMOKE}/orders.parquet") \
            .filter("o_orderkey < 700").count()
        assert n == d == want
    finally:
        eng.write_batch_rows, eng.write_concurrency = prev_b, prev_w
        remote.drop_table("bb_t")
