#!/usr/bin/env python
"""r14: measure pure plan-construction time (fn(spark, sf), no action)
for a set of bench entries, with spark.python.sql.dataFrameDebugging
on/off (argv[1] = on|off). Cross-process A/B because the conf is static.

Entries chosen to have NO internal eager materialization (no stage_cut),
so the measured time is pure py4j + analysis driver overhead.
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
NAMES = ["d3_minhash_lsh_candidates", "j5_multiway", "x6_sessionization",
         "x16_bm25_scoring", "q9_product_profit", "x36_doc_bin_packing",
         "x1_asof_join", "q1_pricing_summary"]


def main() -> None:
    flag = sys.argv[1] if len(sys.argv) > 1 else "on"
    from clickhouse_datafusion_spark.queries import QUERIES
    from clickhouse_datafusion_spark.session import get_spark

    spark = get_spark(app_name=f"build_overhead_{flag}", extra_conf={
        "spark.python.sql.dataFrameDebugging.enabled":
            "true" if flag == "on" else "false"})
    spark.range(10).count()
    for n in NAMES:
        QUERIES[n].spark_fn(spark, SF)  # warm module imports etc.
    out = {}
    for n in NAMES:
        fn = QUERIES[n].spark_fn
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            fn(spark, SF)
            ts.append(time.perf_counter() - t0)
        out[n] = round(statistics.median(ts), 4)
    out["_total"] = round(sum(v for k, v in out.items()
                              if not k.startswith("_")), 4)
    print(json.dumps({"flag": flag, "build_median_s": out}))


if __name__ == "__main__":
    main()
