#!/usr/bin/env python
"""r15 (VERDICT item 6): executor_direct at ~100 SMALL micro-batches —
the weak end of the r14 regime table — and the G1 payoff claim: how
much of the per-micro-batch fixed cost is the Spark-4 DataFrame-
debugging driver overhead that session.py disables.

One arm per process (the conf is static):

    python tools/probe_microbatch100_r15.py dbg_off
    python tools/probe_microbatch100_r15.py dbg_on

Replay: sf0.1 events split into 100 parquet files, maxFilesPerTrigger=1
-> 100 micro-batches of ~1k rows through foreachBatch + append_remote
(write_mode=executor_direct). Prints total wall, per-batch cost, and a
'noop' foreachBatch floor on the same stream so the sink-attributable
per-batch cost is separable.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_FILES = 100


def main() -> None:
    arm = sys.argv[1] if len(sys.argv) > 1 else "dbg_off"
    dbg = "false" if arm == "dbg_off" else "true"
    from pyspark.sql import SparkSession

    from clickhouse_datafusion_spark.catalog import resolve_parquet_path
    from clickhouse_datafusion_spark.engine import ClickHouseSparkEngine
    from clickhouse_datafusion_spark.sources.remote_engine import (
        RemoteEngine)

    spark = (SparkSession.builder.master(
                 f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
             .appName(f"probe_mb100_{arm}")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "24g")
             .config("spark.python.sql.dataFrameDebugging.enabled", dbg)
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    eng = ClickHouseSparkEngine(spark)
    remote = RemoteEngine(pool_size=8)
    eng.attach_remote(remote, db="remote")
    remote.start_ingest_server()

    import pyarrow.parquet as pq
    src = pq.read_table(resolve_parquet_path(f"{SF_DIR}/events.parquet"))
    d = "/tmp/probe_mb100_src"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    n = src.num_rows
    step = -(-n // N_FILES)
    for i in range(N_FILES):
        pq.write_table(src.slice(i * step, step), f"{d}/part_{i:03d}.parquet")
    schema = spark.read.parquet(d).schema
    cols = ["event_id", "user_id", "event_type", "ts", "value"]
    total = spark.read.parquet(d).count()

    def stream():
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1").parquet(d)
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

    eng.write_mode = "executor_direct"
    out = {"arm": arm, "n_batches": N_FILES, "rows": total}
    # warm-up (JIT, codegen, ingest wire)
    mk_table("mb100_warm")
    replay(lambda b, i: eng.append_remote("mb100_warm", b))
    for name, fn in (
            ("noop", lambda b, i: None),
            ("count", lambda b, i: b.count()),
            ("executor_direct",
             lambda b, i: eng.append_remote("mb100_sink", b))):
        if name == "executor_direct":
            mk_table("mb100_sink")
        walls = []
        for _ in range(2):
            if name == "executor_direct":
                mk_table("mb100_sink")
            walls.append(round(replay(fn), 2))
        out[name] = {"walls": walls, "best": min(walls),
                     "per_batch_ms": round(min(walls) / N_FILES * 1000, 1)}
    got = remote.execute(
        "SELECT CAST(count(*) AS BIGINT) FROM mb100_sink").column(0)[0].as_py()
    out["sink_rows_ok"] = bool(got == total)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
