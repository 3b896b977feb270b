"""r13 stretch (VERDICT task 8): decompose the streaming federated
sink's per-micro-batch fixed cost before optimizing it.

The r12 st12 replay (1M rows, 5 micro-batches) ran 373k rows/s spool /
346k executor with ~0.2-0.3 s/batch of fixed cost on both planes.
Target: >500k rows/s at 5 micro-batches. Arms on the SAME replay:

  noop      — foreachBatch does nothing: the streaming trigger +
              source-scan floor no sink change can beat
  count     — foreachBatch counts the batch (forces evaluation, no
              remote work): adds the batch-evaluation cost
  spool     — append_remote, spool plane (parquet round trip)
  executor  — append_remote, executor plane (mapInArrow + agg)
  exec_nc   — executor plane variant: per-partition counts summed via
              collect() (no agg exchange, no AQE final stage)
  arrow     — direct toArrow() collect + insert_arrow_batches (no
              parquet spool; driver memory = one micro-batch)
"""

from __future__ import annotations

import os
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
             .appName("probe_microbatch_cost")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    eng = ClickHouseSparkEngine(spark)
    remote = RemoteEngine(pool_size=8)
    eng.attach_remote(remote, db="remote")
    remote.start_ingest_server()

    # replay corpus: 10 copies of sf0.1 events (~1M rows), 2 files per
    # trigger = 5 micro-batches (the st12 protocol)
    src = resolve_parquet_path(f"{SF_DIR}/events.parquet")
    d = "/tmp/probe_mb_src"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    for i in range(10):
        shutil.copy(src, f"{d}/part_{i}.parquet")
    total = spark.read.parquet(d).count()
    schema = spark.read.parquet(d).schema
    cols = ["event_id", "user_id", "event_type", "ts", "value"]

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

    def arm_noop():
        return replay(lambda b, i: None)

    def arm_count():
        return replay(lambda b, i: b.count())

    def mk_table(name):
        remote.drop_table(name, if_exists=True)
        remote.create_table(
            name, "event_id BIGINT, user_id BIGINT, event_type VARCHAR, "
            "ts TIMESTAMP, value BIGINT")

    def arm_spool():
        mk_table("mb_sp")
        eng.write_mode = "spool"
        return replay(lambda b, i: eng.append_remote("mb_sp", b))

    def arm_executor():
        mk_table("mb_ex")
        eng.write_mode = "executor"
        return replay(lambda b, i: eng.append_remote("mb_ex", b))

    def arm_arrow():
        """The SHIPPED direct plane (write_mode='direct')."""
        mk_table("mb_ar")
        eng.write_mode = "direct"
        return replay(lambda b, i: eng.append_remote("mb_ar", b))

    def arm_arrow_x1():
        """Direct plane + exactly-once (transactional single-cursor)."""
        mk_table("mb_x1")
        eng.write_mode = "direct"
        import uuid
        sid = uuid.uuid4().hex

        def fn(b, i):
            eng.append_remote_exactly_once("mb_x1", b, i, sink_id=sid)
        return replay(fn)

    arms = {"noop": arm_noop, "count": arm_count, "spool": arm_spool,
            "executor": arm_executor, "direct": arm_arrow,
            "direct_x1": arm_arrow_x1}
    res = {k: [] for k in arms}
    # one untimed warm-up replay so cycle 0 isn't a JVM/worker warm-up
    arm_noop()
    for cyc in range(4):
        for k, fn in arms.items():
            res[k].append(round(fn(), 3))
        print(f"cycle {cyc}: {res}")
    for k, v in res.items():
        best = min(v)
        print(f"{k}: best={best}s  ({total/best/1000:.0f}k rows/s)  "
              f"per-batch={best/5:.3f}s  all={v}")
    # verify the data actually landed (tables recreated per run; the
    # last run of each arm must hold exactly one replay's rows)
    for t in ("mb_sp", "mb_ex", "mb_ar", "mb_x1"):
        n = remote.execute(
            f"SELECT CAST(count(*) AS BIGINT) FROM {t}"
        ).column(0)[0].as_py()
        print(f"{t}: {n} rows (expect {total})")
    shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
