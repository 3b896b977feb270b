#!/usr/bin/env python
"""r12: executor-parallel vs driver-spool federated write throughput.

Same 6M-row unshippable source (the r11 matrix's shape) through both
data planes, interleaved A/B in one session. The executor path opens
one Arrow-IPC TCP connection per source partition straight to the
remote's ingest server — the driver never touches a row. On this
single-host test topology the remote's pooled DuckDB ingest is the
shared sink either way, so the measurable difference is the funnel
(spool write + driver pull + driver-side pooled appends) vs N direct
pipes; on a real cluster the executor path additionally removes the
driver NIC from the data path entirely.
"""
from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, "/root/repo")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import SparkSession

    from clickhouse_datafusion_spark.engine import ClickHouseSparkEngine
    from clickhouse_datafusion_spark.sources.remote_engine import (
        RemoteEngine)

    spark = (SparkSession.builder.master("local[16]")
             .appName("probe_executor_write")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    eng = ClickHouseSparkEngine(spark)
    eng.write_concurrency = 8
    eng.write_batch_rows = 262_144
    remote = RemoteEngine(pool_size=8)
    remote.register_parquet_dir(SF_DIR, tables=["lineitem"])
    eng.attach_remote(remote, db="remote", local_twin_dir=SF_DIR)
    remote.start_ingest_server()

    base = ("SELECT l_orderkey + {off} AS k, log(l_extendedprice) AS v "
            "FROM clickhouse.remote.lineitem")
    src10 = " UNION ALL ".join(
        base.format(off=i * 100_000_000) for i in range(10))
    n_want = spark.read.parquet(os.path.join(
        SF_DIR, "lineitem.parquet")).count() * 10

    results = []
    for cycle in range(2):
        for mode in ("spool", "executor"):
            eng.write_mode = mode
            remote.create_table("probe_w", "k BIGINT, v DOUBLE")
            try:
                t0 = time.time()
                eng.sql(f"INSERT INTO clickhouse.remote.probe_w {src10}")
                wall = time.time() - t0
                n = remote.execute(
                    "SELECT CAST(count(*) AS BIGINT) FROM probe_w"
                ).column(0)[0].as_py()
                assert n == n_want, (n, n_want)
                results.append({
                    "cycle": cycle, "mode": mode,
                    "insert_kind": eng.last_remote_insert,
                    "rows": n, "wall_s": round(wall, 2),
                    "rows_per_s": round(n / wall),
                    "maxrss_gb": round(resource.getrusage(
                        resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)})
                print(results[-1], flush=True)
            finally:
                remote.drop_table("probe_w")
    print(json.dumps({"probe": "executor_vs_spool_write",
                      "results": results}))


if __name__ == "__main__":
    main()
