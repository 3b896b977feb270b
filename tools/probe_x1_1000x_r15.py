#!/usr/bin/env python
"""r15 (VERDICT item 5): deep-scale probe for the as-of join family —
the one heavy join family with no 100x/1000x point. Builds a 1000x
events corpus (user_id/event_id shifted per shard, ts unchanged, so
per-user streams keep their 1x shape and user count scales — the
web-scale shape), then measures the x1 asof-join kernel at 1x/100x/
1000x in ONE session, alternating, checksum-verified row counts.

The 100x arm reads the same file with a user_id range filter (shards
are row-group-aligned, so parquet min/max stats prune the scan).

Usage: python tools/probe_x1_1000x_r15.py [--rebuild] [iters]
"""
from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/root/repo/.tdcache/sf1000x_events"
COPIES = 1000
OFFSET = 10_000_000


def build(spark, rebuild: bool = False) -> str:
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    marker = os.path.join(OUT, "_BUILT")
    if os.path.exists(marker) and not rebuild:
        return OUT
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    src = spark.read.parquet(os.path.join(SRC, "events.parquet"))
    shards = spark.range(0, COPIES).select(F.col("id").alias("_shard"))
    shifted = (src.crossJoin(shards)
               .select((F.col("user_id") + F.col("_shard") * OFFSET)
                       .alias("user_id"),
                       (F.col("event_id") + F.col("_shard") * OFFSET)
                       .alias("event_id"),
                       "ts", "event_type", "value", "props", "_shard"))
    parts = os.path.join(OUT, "_parts")
    (shifted.repartitionByRange(64, "_shard").drop("_shard")
     .write.mode("overwrite").parquet(parts))
    ds = pads.dataset(parts, format="parquet")
    writer, path = None, os.path.join(OUT, "events.parquet")
    for batch in ds.to_batches(batch_size=262144):
        if writer is None:
            writer = pq.ParquetWriter(path, batch.schema)
        writer.write_batch(batch)
    writer.close()
    shutil.rmtree(parts, ignore_errors=True)
    open(marker, "w").close()
    return OUT


def main() -> None:
    iters = int(sys.argv[-1]) if sys.argv[-1].isdigit() else 3

    from pyspark.sql import functions as F

    from clickhouse_datafusion_spark.operators.asof import asof_join
    from clickhouse_datafusion_spark.session import get_spark

    spark = get_spark(app_name="probe_x1_1000x_r15")
    build(spark, rebuild="--rebuild" in sys.argv)

    full = spark.read.parquet(os.path.join(OUT, "events.parquet"))
    arms = {
        "1x": spark.read.parquet(os.path.join(SRC, "events.parquet")),
        "100x": full.filter(F.col("user_id") < 100 * OFFSET),
        "1000x": full,
    }

    def run(ev):
        clicks = ev.filter(F.col("event_type") == "click")
        views = ev.filter(F.col("event_type") == "view")
        out = asof_join(clicks, views, on="user_id",
                        left_ts="ts", right_ts="ts")
        row = out.agg(
            F.count("*").alias("rows"),
            F.expr("bit_xor(xxhash64(event_id, event_id_r))").alias("h"),
        ).collect()[0]
        return row["rows"], row["h"]

    results = {}
    checks = {}
    for i in range(iters):
        for name, ev in arms.items():
            t0 = time.perf_counter()
            rows, h = run(ev)
            results.setdefault(name, []).append(time.perf_counter() - t0)
            checks[name] = (rows, h)
    out = {name: {"best": round(min(ts), 2),
                  "median": round(statistics.median(ts), 2),
                  "all": [round(t, 2) for t in ts],
                  "rows": checks[name][0]}
           for name, ts in results.items()}
    b1, b100, b1000 = (out["1x"]["best"], out["100x"]["best"],
                       out["1000x"]["best"])
    out["decade_factor_1_to_100"] = round((b100 / b1) ** 0.5, 2)
    out["decade_factor_100_to_1000"] = round(b1000 / b100, 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
