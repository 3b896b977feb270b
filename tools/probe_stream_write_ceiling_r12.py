#!/usr/bin/env python
"""r12 verdict task 5: the driver-funnel bandwidth CEILING of the
streamed federated write.

The r11 streamed write path is driver-BOUNDED in memory but
driver-SERIALIZED in bandwidth: every byte of an unshippable INSERT
source flows through the one Python driver process (spool pull +
pooled appends). This is exact parity with the reference — its sink is
also a single client process streaming RecordBatches to the server
(src/sink.rs:102-211) — so the question is where the funnel's
throughput ceiling sits and whether it degrades with source size.

Single-table scaling run at the tuned cell (wc=8, br=256k): 0.6M →
6M → 60M rows, recording wall, rows/s, and Python-driver maxrss.
A flat rows/s across two decades = the funnel is a constant-rate pipe
(wall grows linearly, memory flat); a sagging curve would mean the
ceiling binds harder as sources grow.
"""
from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, "/root/repo")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def maxrss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main() -> None:
    from pyspark.sql import SparkSession

    from clickhouse_datafusion_spark.engine import ClickHouseSparkEngine
    from clickhouse_datafusion_spark.sources.remote_engine import (
        RemoteEngine)

    spark = (SparkSession.builder.master("local[16]")
             .appName("probe_stream_write_ceiling")
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

    base = ("SELECT l_orderkey + {off} AS k, log(l_extendedprice) AS v "
            "FROM clickhouse.remote.lineitem")
    n_li = spark.read.parquet(os.path.join(
        SF_DIR, "lineitem.parquet")).count()

    results = []
    for copies in (1, 10, 100):
        src = " UNION ALL ".join(
            base.format(off=i * 100_000_000) for i in range(copies))
        remote.create_table("probe_w", "k BIGINT, v DOUBLE")
        try:
            t0 = time.time()
            eng.sql(f"INSERT INTO clickhouse.remote.probe_w {src}")
            wall = time.time() - t0
            assert eng.last_remote_insert == "arrow-stream"
            n = remote.execute(
                "SELECT CAST(count(*) AS BIGINT) FROM probe_w"
            ).column(0)[0].as_py()
            assert n == n_li * copies, (n, n_li, copies)
            results.append({"case": f"{copies}x", "rows": n,
                            "wall_s": round(wall, 1),
                            "rows_per_s": round(n / wall),
                            "maxrss_gb": round(maxrss_gb(), 2)})
            print(results[-1])
        finally:
            remote.drop_table("probe_w")

    print(json.dumps({"probe": "stream_write_ceiling",
                      "wc": 8, "batch_rows": 262_144,
                      "sf_dir": SF_DIR, "results": results}))


if __name__ == "__main__":
    main()
