"""r13 property-channel targets (VERDICT task 7) — the three seams the
r12 verdict named:

1. the ingest server under CONCURRENT MIXED PLANES: query-op range
   pulls racing transactional appends racing a tail's progress
   upserts, all on the same table and the same bounded cursor pool;
2. duplicate keys at ``key_type="timestamp"`` partition boundaries —
   quantile bounds land ON duplicated keys, ranges must still deliver
   every row exactly once;
3. the self-referential CDC loop: a tail whose exactly-once SINK table
   IS the tailed table (the cycle the wrapper never constructs on its
   own) — the feedback must converge with exactly-once per generation.
"""

from __future__ import annotations

import datetime as dt
import json
import random
import socket
import threading

import pyarrow as pa
import pytest

from clickhouse_datafusion_spark.sources.clickhouse_tail import (
    _progress_op,
    _wire_query,
)
from clickhouse_datafusion_spark.sources.remote_engine import RemoteEngine
from clickhouse_datafusion_spark.streaming import tail_remote_table
from clickhouse_datafusion_spark.streaming.events import (
    drain_tail_until_stable)


@pytest.fixture()
def remote():
    r = RemoteEngine(pool_size=3)   # small pool: force contention
    yield r
    r.stop_ingest_server()


def _ingest_txn(host, port, table, batches, token=None):
    """One wire ingest connection = one remote transaction."""
    with socket.create_connection((host, port)) as s:
        f = s.makefile("rwb")
        req = {"table": table, "columns": ""}
        if token is not None:
            req["token"] = token
        hdr = json.dumps(req).encode()
        f.write(len(hdr).to_bytes(4, "big"))
        f.write(hdr)
        w = pa.ipc.new_stream(f, batches[0].schema)
        for b in batches:
            w.write_batch(b)
        w.close()
        f.flush()
        status = f.read(1)
        if status != b"\x00":
            ln = int.from_bytes(f.read(4), "big")
            raise RuntimeError(f.read(ln).decode())
        return int.from_bytes(f.read(8), "big")


def test_concurrent_mixed_planes_on_one_table(remote):
    """2 writer threads (wire transactions of exactly 1000 rows), 2
    reader threads (query-op scans), 1 progress thread (put/get
    cycles) — all on one table over a 3-cursor pool. Properties:

    * ATOMIC VISIBILITY: every concurrent count() observation is a
      multiple of 1000 — a range pull can never see a transaction's
      partial prefix;
    * nothing errors, nothing deadlocks, the final count is exact;
    * the progress row reads back MONOTONE under interleaved puts.
    """
    remote.create_table("mix_t", "k BIGINT, v DOUBLE")
    host, port = remote.start_ingest_server()
    TXNS, ROWS = 6, 1000
    errors: list[str] = []
    observed: list[int] = []
    prog_reads: list[int] = []
    stop = threading.Event()

    def writer(wid: int):
        try:
            for t in range(TXNS):
                base = (wid * TXNS + t) * ROWS
                batches = [pa.record_batch({
                    "k": list(range(base + i * 250, base + (i + 1) * 250)),
                    "v": [0.5] * 250}) for i in range(ROWS // 250)]
                n = _ingest_txn(host, port, "mix_t", batches)
                assert n == ROWS
        except Exception as e:  # surfaces in the main thread's assert
            errors.append(f"writer{wid}: {type(e).__name__}: {e}")

    def reader(rid: int):
        try:
            while not stop.is_set():
                n = None
                for b in _wire_query(
                        host, port,
                        "SELECT CAST(count(*) AS BIGINT) AS n FROM mix_t"):
                    n = b.column(0)[0].as_py()
                observed.append(int(n))
        except Exception as e:
            errors.append(f"reader{rid}: {type(e).__name__}: {e}")

    def progress():
        try:
            wm = 0
            while not stop.is_set():
                wm += random.randint(1, 50)
                _progress_op(host, port, "mix_t", "mix-tail", "put",
                             watermark=wm)
                got = _progress_op(host, port, "mix_t", "mix-tail", "get")
                prog_reads.append(int(got))
        except Exception as e:
            errors.append(f"progress: {type(e).__name__}: {e}")

    random.seed(13)
    threads = ([threading.Thread(target=writer, args=(w,))
                for w in range(2)]
               + [threading.Thread(target=reader, args=(r,))
                  for r in range(2)]
               + [threading.Thread(target=progress)])
    for t in threads:
        t.start()
    for t in threads[:2]:
        t.join(timeout=120)
    stop.set()
    for t in threads[2:]:
        t.join(timeout=30)
    assert not errors, errors
    assert all(n % ROWS == 0 for n in observed), (
        "a reader saw a transaction's partial prefix: "
        f"{[n for n in observed if n % ROWS][:5]}")
    assert observed, "readers never got a row in"
    assert prog_reads == sorted(prog_reads), "progress row went backwards"
    final = remote.execute(
        "SELECT CAST(count(*) AS BIGINT) FROM mix_t").column(0)[0].as_py()
    assert final == 2 * TXNS * ROWS


def test_duplicate_timestamp_keys_at_partition_boundaries(spark, remote):
    """Heavy key duplication makes quantile boundaries LAND on
    duplicated values (few distinct keys, many rows each, random per
    seed) — the half-open range split must still deliver every row
    exactly once, across two insert phases and a capped catch-up."""
    rng = random.Random(131)
    base = dt.datetime(2026, 1, 1, 12, 0, 0)

    def phase(n_rows, lo_s, hi_s, id0):
        # ~8 distinct timestamps covering the second-range — guarantees
        # every quantile boundary is a duplicated key
        ticks = sorted(rng.sample(range(lo_s, hi_s), 8))
        ts = [base + dt.timedelta(seconds=rng.choice(ticks))
              for _ in range(n_rows)]
        ids = list(range(id0, id0 + n_rows))
        return pa.table({
            "ts": pa.array(sorted(ts), type=pa.timestamp("us")),
            "id": ids})

    remote.create_table("t_dupk", "ts TIMESTAMP, id BIGINT")
    remote.insert_arrow("t_dupk", phase(1200, 0, 1000, 0))
    stream = tail_remote_table(spark, remote, "t_dupk", "ts",
                               key_type="timestamp", num_partitions=4,
                               max_rows_per_batch=300)
    q = (stream.writeStream.format("memory").queryName("t_dupk_sink")
         .outputMode("append").start())
    try:
        drain_tail_until_stable(q)
        # phase 2: strictly above the committed watermark (the
        # append-only-in-key contract), same duplication shape
        remote.insert_arrow("t_dupk", phase(800, 2000, 3000, 1200))
        drain_tail_until_stable(q)
        got = spark.table("t_dupk_sink").toPandas()
    finally:
        q.stop()
    assert len(got) == 2000
    assert sorted(got["id"].tolist()) == list(range(2000)), \
        "duplicate-key ranges lost or doubled rows"


def test_self_referential_cdc_loop_converges(spark, remote, tmp_path):
    """Tail table T and exactly-once-append the transform BACK INTO T
    (sink == source — the feedback cycle). Each written generation
    re-enters the tail; with the transform forwarding only gen < 3,
    the loop must CONVERGE to exactly one row per (origin, generation)
    for generations 0..3 — exactly-once on every lap of the cycle.
    Keys are re-minted above the current high-water mark per lap, so
    the append-only-in-key contract holds around the loop."""
    from pyspark.sql import functions as F

    from clickhouse_datafusion_spark.engine import ClickHouseSparkEngine

    eng = ClickHouseSparkEngine(spark)
    eng.attach_remote(remote, db="remote")
    N, GENS = 200, 3
    remote.create_table("t_loop", "k BIGINT, origin BIGINT, gen BIGINT")
    remote.insert_arrow("t_loop", pa.table({
        "k": list(range(1, N + 1)),
        "origin": list(range(1, N + 1)),
        "gen": [0] * N}))

    stream = tail_remote_table(spark, remote, "t_loop", "k")

    def lap(batch, bid):
        fwd = (batch.filter(F.col("gen") < GENS)
               .select((F.col("k") + 1_000_000).alias("k"), "origin",
                       (F.col("gen") + 1).alias("gen")))
        if not fwd.isEmpty():
            eng.append_remote_exactly_once("t_loop", fwd, bid,
                                           sink_id="loop")

    q = (stream.writeStream.outputMode("append")
         .option("checkpointLocation", str(tmp_path / "loop_ckpt"))
         .foreachBatch(lap).start())
    try:
        drain_tail_until_stable(q, stable_rounds=3)
    finally:
        q.stop()
    tbl = remote.execute(
        "SELECT CAST(gen AS BIGINT) AS gen, "
        "CAST(count(*) AS BIGINT) AS n, "
        "CAST(count(DISTINCT origin) AS BIGINT) AS d "
        "FROM t_loop GROUP BY gen ORDER BY gen").to_pydict()
    assert tbl["gen"] == [0, 1, 2, 3]
    assert tbl["n"] == [N] * 4, f"a lap doubled or dropped rows: {tbl}"
    assert tbl["d"] == [N] * 4
    total = remote.execute(
        "SELECT CAST(count(*) AS BIGINT) FROM t_loop"
    ).column(0)[0].as_py()
    assert total == (GENS + 1) * N
