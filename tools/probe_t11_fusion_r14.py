#!/usr/bin/env python
"""A/B probe for the r14 grouping-sets LM-build fusion (one shuffle +
one stage cut vs the previous two-shuffle + two-cut build).

Runs bench-faithful timed iterations (construct inside the timed
region, toPandas action) for the entries given on argv (default t11 +
t11c) in THIS process and prints one JSON line. Drive it alternately
from two git states for an interleaved cross-process A/B.

Usage::

    python tools/probe_t11_fusion_r14.py [entry ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ITERS = int(os.environ.get("PLAN_ITERS", "5"))


def main() -> None:
    from clickhouse_datafusion_spark.queries import QUERIES
    from clickhouse_datafusion_spark.session import get_spark

    names = sys.argv[1:] or ["t11_bigram_lm_score", "t11c_bigram_lm_shuffle"]
    spark = get_spark(app_name="probe_t11_fusion_r14")
    spark.range(1000).selectExpr("sum(id)").collect()
    QUERIES["flagship_top_customers"].spark_fn(spark, SF).collect()

    out = {}
    for name in names:
        fn = QUERIES[name].spark_fn
        fn(spark, SF).toPandas()  # warm-up
        constructs, totals = [], []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            df = fn(spark, SF)
            constructs.append(time.perf_counter() - t0)
            df.toPandas()
            totals.append(time.perf_counter() - t0)
        totals.sort()
        out[name] = {
            "best_s": round(totals[0], 4),
            "median_s": round(totals[len(totals) // 2], 4),
            "construct_min_s": round(min(constructs), 4),
        }
    sc = spark.sparkContext._jsc.sc()
    out["_jobs_total"] = sc.statusTracker().getJobIdsForGroup(None).__len__()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
