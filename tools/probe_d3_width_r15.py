#!/usr/bin/env python
"""r15 measurement probe (VERDICT item 1): does the post-shuffle width of
d3/d3x's banding stages matter at sf0.1?

Arms (fresh JVM per arm, interleaved by the wrapper loop):

- base:  shipped code, shipped confs
- sp5:   spark.sql.shuffle.partitions=5 (bounds the win if EVERY reduce
         exchange in the query were width-derived; config-only, NOT a
         shippable change — a measurement of headroom)
- pf:    spark.sql.adaptive.coalescePartitions.parallelismFirst=false
         (size-based AQE coalescing; global arm was adjudicated negative
         in r14 because of JOIN entries — d3/d3x have no shuffle joins,
         so this bounds the per-operator version)

Usage: python tools/probe_d3_width_r15.py <arm> <entry>
Prints one JSON line {arm, entry, times:[...]}.
"""
from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

ARMS = {
    "base": {},
    "sp5": {"spark.sql.shuffle.partitions": "5"},
    "pf": {"spark.sql.adaptive.coalescePartitions.parallelismFirst":
           "false"},
}


def main() -> None:
    arm, entry = sys.argv[1], sys.argv[2]
    from clickhouse_datafusion_spark.queries import QUERIES
    from clickhouse_datafusion_spark.session import get_spark

    spark = get_spark(app_name=f"probe_d3_width_{arm}",
                      extra_conf=ARMS[arm])
    spark.range(1000).selectExpr("sum(id)").collect()
    fn = QUERIES[entry].spark_fn
    fn(spark, SF).toPandas()  # warm-up
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        fn(spark, SF).toPandas()
        times.append(round(time.perf_counter() - t0, 4))
    print(json.dumps({"arm": arm, "entry": entry, "times": times,
                      "best": min(times)}))


if __name__ == "__main__":
    main()
