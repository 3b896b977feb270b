#!/usr/bin/env python
"""r12: throughput of the clickhouse_tail streaming source — drain a
1M-row remote table through the Arrow query endpoint at varying
num_partitions (the wire-parallelism lever; the read-direction twin of
the r12 executor-write matrix). Interleaved arms, 2 cycles."""
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    import pyarrow as pa

    from pyspark.sql import SparkSession

    from clickhouse_datafusion_spark.sources.remote_engine import RemoteEngine
    from clickhouse_datafusion_spark.streaming import tail_remote_table

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "false")
             .appName("tail-throughput").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    n = int(os.environ.get("TAIL_ROWS", "1000000"))
    remote = RemoteEngine(pool_size=8)
    remote.create_table("tp", "k BIGINT, v DOUBLE, s VARCHAR")
    step = 100_000
    for lo in range(0, n, step):
        m = min(step, n - lo)
        remote.insert_arrow("tp", pa.table({
            "k": list(range(lo + 1, lo + m + 1)),
            "v": [float(i) for i in range(m)],
            "s": [f"payload_{i:012d}" for i in range(m)]}))

    def drain(nparts):
        got = {"rows": 0}
        stream = tail_remote_table(spark, remote, "tp", "k",
                                   num_partitions=nparts)
        t0 = time.perf_counter()
        q = (stream.writeStream.outputMode("append")
             .foreachBatch(lambda b, i: got.__setitem__(
                 "rows", got["rows"] + b.count())).start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        dt = time.perf_counter() - t0
        assert got["rows"] == n, (got, n)
        return dt

    arms = [1, 4, 8, 16]
    drain(4)  # warm-up (JVM, python workers, schema probe)
    for cycle in range(2):
        for p in arms:
            dt = drain(p)
            print(f"cycle={cycle} num_partitions={p:2d} wall={dt:6.2f}s "
                  f"rows_per_sec={n/dt/1e6:5.2f}M", flush=True)
    remote.stop_ingest_server()


if __name__ == "__main__":
    main()
