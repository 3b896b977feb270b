"""r14 (VERDICT task 2): measure the executor_direct write plane
against the r13 planes on BOTH ends of its claimed regime:

A. the st12 replay (1M rows, 5 micro-batches) — the fixed-cost
   regime where 'direct' (driver-funnel Arrow) won r13 at 659k rows/s.
   Done bar: executor_direct >= direct here, while keeping executors,
   not the driver, on the data path.
B. one 10M-row batch — the depth regime where 'direct' is capped by
   driver memory. Done bar: executor_direct completes with FLAT driver
   RSS (sampled around the append), at wire-bound throughput.

Arms interleave within each cycle (bench-box protocol); exactly-once
variants measure the marker-handshake overhead on the same replay.
"""

from __future__ import annotations

import os
import resource
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import SparkSession

    from clickhouse_datafusion_spark.catalog import resolve_parquet_path
    from clickhouse_datafusion_spark.engine import ClickHouseSparkEngine
    from clickhouse_datafusion_spark.sources.remote_engine import (
        RemoteEngine)

    spark = (SparkSession.builder.master(
                 f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
             .appName("probe_executor_direct")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    eng = ClickHouseSparkEngine(spark)
    remote = RemoteEngine(pool_size=8)
    eng.attach_remote(remote, db="remote")
    remote.start_ingest_server()
    eng.write_concurrency = int(os.environ.get("PROBE_WC", "8"))

    src = resolve_parquet_path(f"{SF_DIR}/events.parquet")
    d = "/tmp/probe_xd_src"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    for i in range(10):
        shutil.copy(src, f"{d}/part_{i}.parquet")
    total = spark.read.parquet(d).count()
    schema = spark.read.parquet(d).schema
    cols = ["event_id", "user_id", "event_type", "ts", "value"]
    print(f"replay corpus: {total} rows, 5 micro-batches, "
          f"wc={eng.write_concurrency}")

    def stream():
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "2").parquet(d)
                .select(*cols))

    def replay(fn):
        q = (stream().writeStream.foreachBatch(fn)
             .outputMode("append").start())
        t0 = time.perf_counter()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return time.perf_counter() - t0

    def mk_table(name):
        remote.drop_table(name, if_exists=True)
        remote.create_table(
            name, "event_id BIGINT, user_id BIGINT, event_type VARCHAR, "
            "ts TIMESTAMP, value BIGINT")

    def plain(mode, table):
        def arm():
            mk_table(table)
            eng.write_mode = mode
            return replay(lambda b, i: eng.append_remote(table, b))
        return arm

    def x1(mode, table):
        def arm():
            mk_table(table)
            eng.write_mode = mode
            import uuid
            sid = uuid.uuid4().hex
            return replay(lambda b, i: eng.append_remote_exactly_once(
                table, b, i, sink_id=sid))
        return arm

    arms = {
        "direct": plain("direct", "xd_d"),
        "executor": plain("executor", "xd_e"),
        "executor_direct": plain("executor_direct", "xd_x"),
        "direct_x1": x1("direct", "xd_d1"),
        "executor_direct_x1": x1("executor_direct", "xd_x1"),
    }
    res = {k: [] for k in arms}
    plain("direct", "xd_warm")()        # untimed warm-up replay
    for cyc in range(4):
        for k, fn in arms.items():
            res[k].append(round(fn(), 3))
        print(f"cycle {cyc}: {res}")
    for k, v in res.items():
        best = min(v)
        print(f"{k}: best={best}s  ({total/best/1000:.0f}k rows/s)  "
              f"per-batch={best/5:.3f}s  all={v}")
    for t in ("xd_d", "xd_e", "xd_x", "xd_d1", "xd_x1"):
        n = remote.execute(
            f"SELECT CAST(count(*) AS BIGINT) FROM {t}"
        ).column(0)[0].as_py()
        ok = "OK" if n == total else "MISMATCH"
        print(f"{t}: {n} rows (expect {total}) {ok}")

    # -- B: one 10M-row batch, driver memory flat ------------------------
    print("\n10M-row single batch through executor_direct:")
    big = spark.range(0, 10_000_000).selectExpr(
        "id AS event_id", "id % 100000 AS user_id",
        "CAST(id % 7 AS STRING) AS event_type",
        "timestamp_micros(CAST(1700000000000000 + id AS BIGINT)) AS ts",
        "id % 997 AS value").repartition(32)
    mk_table("xd_big")
    eng.write_mode = "executor_direct"
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    t0 = time.perf_counter()
    n = eng.append_remote("xd_big", big)
    dt = time.perf_counter() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    print(f"executor_direct 10M: {dt:.2f}s ({n/dt/1e6:.2f}M rows/s), "
          f"rows={n}, driver maxrss {rss0} -> {rss1} MiB "
          f"(delta {rss1-rss0} MiB — the data path is executor-side; "
          f"a driver-funnel plane would grow by the whole batch)")
    got = remote.execute(
        "SELECT CAST(count(*) AS BIGINT) FROM xd_big"
    ).column(0)[0].as_py()
    print(f"xd_big: {got} rows (expect 10000000) "
          f"{'OK' if got == 10_000_000 else 'MISMATCH'}")
    shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
