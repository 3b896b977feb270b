#!/usr/bin/env python
"""r13: the exactly-once CDC pipeline (tail -> transform ->
append_remote_exactly_once) A/B'd across write planes — the r12 probe
ran the spool plane at 2.4 s warm for 1M rows; the direct-arrow plane
(write_mode='direct', r13) skips the per-batch parquet spool round
trip inside the same single-cursor transactional drain. Interleaved
arms, value identity asserted per trial."""
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    import pyarrow as pa

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from clickhouse_datafusion_spark.engine import ClickHouseSparkEngine
    from clickhouse_datafusion_spark.sources.remote_engine import RemoteEngine
    from clickhouse_datafusion_spark.streaming import tail_remote_table

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "false")
             .appName("cdc-direct").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    n = int(os.environ.get("CDC_ROWS", "1000000"))
    eng = ClickHouseSparkEngine(spark)
    remote = RemoteEngine(pool_size=8)
    eng.attach_remote(remote, db="remote")
    remote.create_table("cdc_s", "k BIGINT, v DOUBLE")
    remote.create_table("cdc_d", "k BIGINT, v2 DOUBLE")
    step = 250_000
    for lo in range(0, n, step):
        m = min(step, n - lo)
        remote.insert_arrow("cdc_s", pa.table({
            "k": list(range(lo + 1, lo + m + 1)),
            "v": [float(i) * 0.5 for i in range(lo + 1, lo + m + 1)]}))

    res = {"spool": [], "direct": []}
    for cyc in range(3):
        for mode in ("spool", "direct"):
            tag = f"{mode}_{cyc}"
            remote.execute("DELETE FROM cdc_d")
            if "cdc_d__commits" in remote.tables():
                remote.execute("DELETE FROM cdc_d__commits")
            eng.write_mode = mode
            tail = tail_remote_table(spark, remote, "cdc_s", "k",
                                     num_partitions=8, tail_id=tag)
            t0 = time.perf_counter()
            q = (tail.select("k", (F.col("v") * 2).alias("v2"))
                 .writeStream.outputMode("append")
                 .foreachBatch(
                     lambda b, bid: eng.append_remote_exactly_once(
                         "cdc_d", b, bid, sink_id=tag)).start())
            try:
                q.processAllAvailable()
            finally:
                q.stop()
            dt = time.perf_counter() - t0
            got, bad = (remote.execute(
                "SELECT CAST(count(*) AS BIGINT), "
                "CAST(sum(CASE WHEN v2 <> k THEN 1 ELSE 0 END) AS BIGINT) "
                "FROM cdc_d").to_pylist()[0].values())
            assert got == n and bad == 0, (got, bad)
            res[mode].append(round(dt, 2))
        print(f"cycle {cyc}: {res}", flush=True)
    for mode, v in res.items():
        print(f"{mode}: best={min(v)}s ({n/min(v)/1e6:.2f}M rows/s) "
              f"all={v}")
    remote.stop_ingest_server()


if __name__ == "__main__":
    main()
