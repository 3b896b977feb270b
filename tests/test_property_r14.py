"""r14 property-channel targets (r13 VERDICT task 6) — the three seams
the judge named:

1. the DIRECT exactly-once plane crashing between the Arrow collect
   and the pooled write (and crashing MID-drain inside the
   transaction): a foreachBatch replay must land the batch exactly
   once, never zero or twice;
2. ``tail_lag`` monotonicity under concurrent appends + capped
   catch-up: the reported watermark may only rise, the backlog may
   never go negative, and a finished drain reports backlog 0;
3. the executor_direct plane (r14) under PARTITION-GRAIN failure: a
   job that crashes after SOME partitions committed must, on replay,
   append exactly the missing partitions — the per-partition commit
   markers are the fence (task retry, speculative twin, and
   foreachBatch replay all reduce to this shape).
"""

from __future__ import annotations

import threading
import time

import pyarrow as pa
import pytest

from clickhouse_datafusion_spark.sources.remote_engine import RemoteEngine
from tests.conftest import SF_SMOKE


@pytest.fixture()
def fed(spark):
    from clickhouse_datafusion_spark.engine import ClickHouseSparkEngine

    eng = ClickHouseSparkEngine(spark)
    remote = RemoteEngine(pool_size=4)
    remote.register_parquet_dir(SF_SMOKE, tables=["orders"])
    eng.attach_remote(remote, db="remote", local_twin_dir=SF_SMOKE)
    remote.start_ingest_server()
    yield eng, remote
    remote.stop_ingest_server()


def _count(remote, table):
    return remote.execute(
        f"SELECT count(*) FROM {table}").column(0)[0].as_py()


# -- 1. direct plane: crash between collect and pooled write -----------------

def test_direct_x1_crash_before_write_then_replay_exact(fed, spark):
    """Crash AFTER the driver collected the micro-batch but BEFORE the
    transactional drain ran (the window the judge named): neither rows
    nor marker land, and the foreachBatch replay (same batch_id)
    appends the batch exactly once; a second replay skips."""
    eng, remote = fed
    eng.write_mode = "direct"
    remote.create_table("dx1a", "k BIGINT, v DOUBLE")
    src = spark.range(0, 3000).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) / 7 AS v")
    orig = remote.ingest_transaction
    try:
        def crash(*a, **kw):
            raise RuntimeError("injected crash pre-drain (test)")

        remote.ingest_transaction = crash
        with pytest.raises(RuntimeError, match="pre-drain"):
            eng.append_remote_exactly_once("dx1a", src, 0, sink_id="s14a")
        remote.ingest_transaction = orig
        assert _count(remote, "dx1a") == 0
        assert _count(remote, "dx1a__commits") == 0
        # replay lands once ...
        assert eng.append_remote_exactly_once(
            "dx1a", src, 0, sink_id="s14a") == 3000
        assert _count(remote, "dx1a") == 3000
        # ... and a further replay skips whole
        assert eng.append_remote_exactly_once(
            "dx1a", src, 0, sink_id="s14a") == 0
        assert _count(remote, "dx1a") == 3000
    finally:
        remote.ingest_transaction = orig
        eng.write_mode = "spool"
        remote.drop_table("dx1a")


def test_direct_x1_crash_mid_drain_rolls_back_then_replay_exact(fed, spark):
    """Crash MID-drain (the batch iterator dies after the first Arrow
    batch entered the transaction): the transaction rolls back — no
    partial prefix, no marker — and the replay appends the whole batch
    exactly once."""
    eng, remote = fed
    eng.write_mode = "direct"
    eng.write_batch_rows = 1000          # force a multi-batch drain
    remote.create_table("dx1b", "k BIGINT, v DOUBLE")
    src = spark.range(0, 5000).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) / 3 AS v")
    orig = remote.ingest_transaction
    try:
        def flaky(name, batches, columns="", pre_commit_sql=None):
            def poisoned():
                it = iter(batches)
                yield next(it)           # one batch enters the txn
                raise RuntimeError("injected crash mid-drain (test)")
            return orig(name, poisoned(), columns,
                        pre_commit_sql=pre_commit_sql)

        remote.ingest_transaction = flaky
        with pytest.raises(RuntimeError, match="mid-drain"):
            eng.append_remote_exactly_once("dx1b", src, 3, sink_id="s14b")
        remote.ingest_transaction = orig
        # the partial prefix rolled back with its transaction
        assert _count(remote, "dx1b") == 0
        assert _count(remote, "dx1b__commits") == 0
        assert eng.append_remote_exactly_once(
            "dx1b", src, 3, sink_id="s14b") == 5000
        assert _count(remote, "dx1b") == 5000
        assert remote.execute(
            "SELECT count(DISTINCT k) FROM dx1b").column(0)[0].as_py() \
            == 5000
    finally:
        remote.ingest_transaction = orig
        eng.write_mode = "spool"
        eng.write_batch_rows = 65536
        remote.drop_table("dx1b")


# -- 2. tail_lag monotonicity under concurrent appends -----------------------

def test_tail_lag_monotone_under_concurrent_appends(fed, spark, tmp_path):
    """While a capped tail drains AND a writer keeps appending, every
    tail_lag sample must show a non-decreasing watermark and a
    non-negative backlog; once the writer stops and the tail drains,
    backlog is exactly 0, the watermark equals the true max key, and
    the sink holds every row exactly once."""
    from clickhouse_datafusion_spark.sources.clickhouse_tail import tail_lag
    from clickhouse_datafusion_spark.streaming import tail_remote_table
    from clickhouse_datafusion_spark.streaming.events import (
        drain_tail_until_stable)

    eng, remote = fed
    remote.create_table("t_mono", "k BIGINT, v DOUBLE")
    remote.insert_arrow("t_mono", pa.table({
        "k": list(range(1, 2001)), "v": [0.5] * 2000}))
    stop = threading.Event()
    wrote = [2000]

    def writer():
        nxt = 2001
        for _ in range(8):
            remote.insert_arrow("t_mono", pa.table({
                "k": list(range(nxt, nxt + 300)), "v": [1.5] * 300}))
            nxt += 300
            wrote[0] += 300
            time.sleep(0.15)
        stop.set()

    stream = tail_remote_table(spark, remote, "t_mono", "k",
                               max_rows_per_batch=500, tail_id="mono14")
    q = (stream.writeStream.format("memory").queryName("t_mono_sink")
         .option("checkpointLocation", str(tmp_path / "ck_mono"))
         .outputMode("append").start())
    t = threading.Thread(target=writer, daemon=True)
    samples = []
    try:
        t.start()
        while not stop.is_set():
            q.processAllAvailable()
            samples.append(tail_lag(remote, "t_mono", "k",
                                    tail_id="mono14"))
        t.join()
        drain_tail_until_stable(q)
        final = tail_lag(remote, "t_mono", "k", tail_id="mono14")
        wms = [s["watermark"] for s in samples if s["watermark"]
               is not None]
        assert wms == sorted(wms), f"watermark regressed: {wms}"
        assert all(s["backlog_rows"] >= 0 for s in samples)
        assert final["backlog_rows"] == 0
        assert final["latest_key"] == wrote[0] == 4400
        assert final["watermark"] == wrote[0]
        assert spark.table("t_mono_sink").count() == wrote[0]
        assert (spark.table("t_mono_sink").select("k").distinct().count()
                == wrote[0])
    finally:
        stop.set()
        q.stop()
        remote.drop_table("t_mono")


# -- 3. executor_direct plane: partition-grain exactly-once ------------------

def test_executor_direct_x1_replay_skips_whole_batch(fed, spark):
    eng, remote = fed
    eng.write_mode = "executor_direct"
    remote.create_table("xp0", "k BIGINT, v DOUBLE")
    src = spark.range(0, 8000).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v")
    try:
        assert eng.append_remote_exactly_once(
            "xp0", src, 11, sink_id="sx0") == 8000
        assert eng.last_remote_insert == "exactly-once-executor"
        assert eng.append_remote_exactly_once(
            "xp0", src, 11, sink_id="sx0") == 0
        assert eng.last_remote_insert == "exactly-once-skip"
        assert _count(remote, "xp0") == 8000
    finally:
        eng.write_mode = "spool"
        remote.drop_table("xp0")


def test_executor_direct_x1_partial_crash_then_replay_exact(fed, spark):
    """The headline property: a job that fails AFTER some partitions
    committed their (rows + marker) transactions must, on replay,
    append exactly the missing partitions — total rows exact, every
    key exactly once, whole-batch marker present only at the end."""
    eng, remote = fed
    eng.write_mode = "executor_direct"
    eng.write_concurrency = 4            # -> 4 coalesced partitions
    remote.create_table("xp1", "k BIGINT, v DOUBLE")
    src = (spark.range(0, 40000)
           .selectExpr("id AS k", "CAST(id AS DOUBLE) / 9 AS v")
           .repartition(8))
    try:
        eng._x1_fault_partitions = frozenset({2})
        with pytest.raises(Exception):
            eng.append_remote_exactly_once("xp1", src, 5, sink_id="sx1")
        eng._x1_fault_partitions = None
        # QUIESCE before observing: when Spark aborts the job it kills
        # the sibling tasks, but a killed task's server-side wire
        # transaction may still be mid-commit — a count taken in that
        # window goes stale the moment the commit lands (the replay
        # then rightly skips the partition and n2 != 40000 - c1).
        # Exactly-once doesn't depend on the window; the OBSERVATION
        # does, so poll (rows, markers) until two consecutive samples
        # agree.
        def sample():
            return (_count(remote, "xp1"), remote.execute(
                "SELECT count(*) FROM xp1__commits "
                "WHERE sink_id = 'sx1#b5'").column(0)[0].as_py())

        prev = sample()
        for _ in range(50):
            time.sleep(0.2)
            cur = sample()
            if cur == prev:
                break
            prev = cur
        c1, part_markers = prev
        whole_marker = remote.execute(
            "SELECT count(*) FROM xp1__commits "
            "WHERE sink_id = 'sx1' AND batch_id = 5"
        ).column(0)[0].as_py()
        # the crash left a PARTIAL batch: some (possibly zero)
        # partitions fully committed, each with its marker; the
        # whole-batch marker must NOT be there
        assert c1 < 40000
        assert whole_marker == 0
        assert part_markers <= 4
        # replay appends exactly the complement
        n2 = eng.append_remote_exactly_once("xp1", src, 5, sink_id="sx1")
        assert n2 == 40000 - c1
        assert _count(remote, "xp1") == 40000
        assert remote.execute(
            "SELECT count(DISTINCT k) FROM xp1").column(0)[0].as_py() \
            == 40000
        # and a third call skips on the whole-batch marker
        assert eng.append_remote_exactly_once(
            "xp1", src, 5, sink_id="sx1") == 0
        assert _count(remote, "xp1") == 40000
    finally:
        eng._x1_fault_partitions = None
        eng.write_mode = "spool"
        remote.drop_table("xp1")


def test_executor_direct_retried_partition_wire_level_no_double(fed):
    """Wire-level twin of the partition retry: the SAME marker sent
    twice (a re-executed task attempt) appends once — the second
    attempt is gated off BEFORE it streams any data."""
    import json
    import socket

    eng, remote = fed
    remote.create_table("xp2", "k BIGINT")
    host, port = remote.ingest_address

    def attempt(rows):
        with socket.create_connection((host, port)) as s:
            f = s.makefile("rwb")
            hdr = json.dumps({
                "table": "xp2", "columns": "",
                "marker": {"commits": "xp2__commits",
                           "sink": "w#b0", "batch": 1}}).encode()
            f.write(len(hdr).to_bytes(4, "big"))
            f.write(hdr)
            f.flush()
            gate = f.read(1)
            if gate == b"\x11":
                return "skipped"
            assert gate == b"\x10"
            w = pa.ipc.new_stream(f, pa.schema([("k", pa.int64())]))
            w.write_batch(pa.record_batch([pa.array(rows)], names=["k"]))
            w.close()
            f.flush()
            assert f.read(1) == b"\x00"
            return int.from_bytes(f.read(8), "big")

    try:
        assert attempt([1, 2, 3]) == 3
        assert attempt([1, 2, 3]) == "skipped"
        assert _count(remote, "xp2") == 3
    finally:
        remote.drop_table("xp2")


def test_executor_direct_through_token_gated_server(spark):
    """The executor_direct plane against a TOKEN-requiring server (the
    beyond-loopback deployment shape): every partition's wire header
    must carry the shared secret — exactly-once markers included — and
    a tokenless sibling connection is refused without disturbing the
    plane's own writes."""
    import json
    import socket

    from clickhouse_datafusion_spark.engine import ClickHouseSparkEngine

    eng = ClickHouseSparkEngine(spark)
    remote = RemoteEngine(pool_size=4)
    remote.register_parquet_dir(SF_SMOKE, tables=["orders"])
    eng.attach_remote(remote, db="remote", local_twin_dir=SF_SMOKE)
    remote.start_ingest_server(token="s3cr3t-tok")
    eng.write_mode = "executor_direct"
    remote.create_table("xtk", "k BIGINT")
    try:
        src = spark.range(0, 5000).selectExpr("id AS k")
        assert eng.append_remote_exactly_once(
            "xtk", src, 3, sink_id="tk") == 5000
        assert eng.append_remote_exactly_once(
            "xtk", src, 3, sink_id="tk") == 0
        assert _count(remote, "xtk") == 5000
        # a tokenless marker-gated connection is refused at the header
        host, port = remote.ingest_address
        with socket.create_connection((host, port)) as s:
            f = s.makefile("rwb")
            hdr = json.dumps({
                "table": "xtk", "columns": "",
                "marker": {"commits": "xtk__commits",
                           "sink": "tk#b9", "batch": 0}}).encode()
            f.write(len(hdr).to_bytes(4, "big"))
            f.write(hdr)
            f.flush()
            status = f.read(1)
            assert status == b"\x01"
            ln = int.from_bytes(f.read(4), "big")
            assert b"token" in f.read(ln)
        assert _count(remote, "xtk") == 5000
    finally:
        eng.write_mode = "spool"
        remote.drop_table("xtk")
        remote.stop_ingest_server()
