#!/usr/bin/env python
"""j4_self_join at the NEXT scale step (r5 verdict stretch 7).

j4 (lineitem ⋈ lineitem ON l_orderkey, pair counts per order) is the
carried perf-weak bench entry — the only distributable shape is a shuffle
join on the key, so the open question is whether the shuffle-join curve
holds one more decade up, or needs an AQE skew-join assertion.

This script builds a 100×-sf0.1 lineitem (10 key-shifted shards of the
sf1x derivative — j4 touches no other table) under ``.tdcache/sf10x_j4``
and times j4 Spark vs DuckDB at sf1x (6M rows) and sf10x (60M rows).
Key shifts preserve j4's join structure exactly: every shard contributes
the same per-order pair counts, so result size scales linearly and no
artificial hot key is introduced (the real table has ≤7 lines/order —
no skew; AQE's skew handling stays idle and that is the correct plan).

Usage: ``python baseline_j4_100x.py [--rebuild]`` → markdown row + one
JSON line, recorded in BASELINE.md's j4 scaling section.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
SF1X = os.path.join(HERE, ".tdcache", "sf1x")
OUT = os.path.join(HERE, ".tdcache", "sf10x_j4")
COPIES = 10
OFFSET = 100_000_000  # clear of baseline_scale10's 10M-per-shard shifts


def build(rebuild: bool = False) -> str:
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    marker = os.path.join(OUT, "_BUILT")
    if os.path.exists(marker) and not rebuild:
        return OUT
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    src = pq.read_table(os.path.join(SF1X, "lineitem.parquet"))
    writer = None
    path = os.path.join(OUT, "lineitem.parquet")
    for i in range(COPIES):
        t = src.set_column(
            src.schema.get_field_index("l_orderkey"), "l_orderkey",
            pc.add(src.column("l_orderkey"), i * OFFSET))
        if writer is None:
            writer = pq.ParquetWriter(path, t.schema)
        writer.write_table(t)
    writer.close()
    open(marker, "w").close()
    return OUT


def time_spark(spark, sf_dir: str, iters: int = 3) -> float:
    """bench.py / baseline_scale10.py methodology: toPandas ↔ duckdb .df()
    — symmetric Arrow/columnar interchange on both engines, full result
    materialization (a bare .count() would let Catalyst prune the very
    work being measured)."""
    from clickhouse_datafusion_spark.queries import QUERIES

    fn = QUERIES["j4_self_join"].spark_fn
    fn(spark, sf_dir).toPandas()  # warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn(spark, sf_dir).toPandas()
        best = min(best, time.perf_counter() - t0)
    return best


def time_duckdb(sf_dir: str, iters: int = 3) -> float:
    import duckdb

    from clickhouse_datafusion_spark.queries import QUERIES

    con = duckdb.connect()
    con.execute(f"SET threads={os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"'{sf_dir}/lineitem.parquet'")
    sql = QUERIES["j4_self_join"].oracle
    con.execute(sql).df()  # warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        con.execute(sql).df()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from pyspark.sql import SparkSession

    rebuild = "--rebuild" in sys.argv
    build(rebuild)
    spark = (SparkSession.builder.master(
                 f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "24g")
             .config("spark.sql.adaptive.enabled", "true")
             # Arrow collection, matching bench.py's get_spark — the
             # row-at-a-time toPandas fallback otherwise taxes large results
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .appName("j4-scale").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    rows = {}
    for label, d in (("sf1x", SF1X), ("sf10x", OUT)):
        s = time_spark(spark, d)
        k = time_duckdb(d)
        rows[label] = {"spark_sec": round(s, 3), "duckdb_sec": round(k, 3),
                       "ratio": round(s / k, 2)}
        print(f"| j4_self_join {label} | {s:.2f} | {k:.2f} | "
              f"{s / k:.2f}x |", file=sys.stderr)
    growth = rows["sf10x"]["spark_sec"] / rows["sf1x"]["spark_sec"]
    print(json.dumps({"metric": "j4_two_scale", "rows": rows,
                      "spark_growth_10x_data": round(growth, 2)}))


if __name__ == "__main__":
    main()
