#!/usr/bin/env python
"""r15 within-session alternating A/B (VERDICT item 1): pin the banding
bucket aggregate's exchange to a size-derived width via an explicit
repartition(width, bk) and measure against the shipped shape, in ONE
session, strictly alternating iterations so box drift cancels.

Usage: python tools/probe_bk_width_r15.py [width] [iters] [entry]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    entry = sys.argv[3] if len(sys.argv) > 3 else "d3_minhash_lsh_candidates"

    from pyspark.sql import functions as F

    from clickhouse_datafusion_spark.operators import dedup
    from clickhouse_datafusion_spark.queries import QUERIES
    from clickhouse_datafusion_spark.session import get_spark

    spark = get_spark(app_name="probe_bk_width_r15")
    spark.range(1000).selectExpr("sum(id)").collect()
    fn = QUERIES[entry].spark_fn

    orig = dedup._bucket_pairs

    def patched(banded, payload_cols):
        return orig(banded.repartition(width, F.col("bk")), payload_cols)

    # value identity once up front
    dedup._bucket_pairs = patched
    new_rows = sorted(map(tuple, fn(spark, SF).collect()))
    dedup._bucket_pairs = orig
    old_rows = sorted(map(tuple, fn(spark, SF).collect()))
    assert new_rows == old_rows, "variant changed results!"

    t_old, t_new = [], []
    for i in range(iters):
        for variant, sink in (("old", t_old), ("new", t_new)):
            dedup._bucket_pairs = orig if variant == "old" else patched
            t0 = time.perf_counter()
            fn(spark, SF).toPandas()
            sink.append(time.perf_counter() - t0)
    dedup._bucket_pairs = orig
    print(json.dumps({
        "entry": entry, "width": width, "iters": iters,
        "old_best": round(min(t_old), 4), "new_best": round(min(t_new), 4),
        "old_median": round(statistics.median(t_old), 4),
        "new_median": round(statistics.median(t_new), 4),
        "old": [round(x, 3) for x in t_old],
        "new": [round(x, 3) for x in t_new],
    }))


if __name__ == "__main__":
    main()
