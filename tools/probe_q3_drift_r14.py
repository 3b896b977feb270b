"""r14 (VERDICT task 7): adjudicate q3_shipping_priority's +16% best
drift in BENCH_r13 (0.3321 -> 0.3852 s) on untouched code — the same
shape as r12's x1 adjudication (tools/probe_x1_drift_r12.py, verdict:
ENVIRONMENTAL) and r13's q3/q1 watch item.

q3's registry body is byte-identical r12->r13 (git log confirms no
queries.py q3 hunk); the two hypotheses are the documented box band
vs a neighbor effect from r13's changed entries (the t11 fold family
runs AFTER q3 in bench order, so a neighbor effect would need
cross-iteration residue, e.g. leftover broadcast/storage blocks).

Protocol (ONE session, bench-identical warm-up):
  A1: q3 x6 quiet
  B : q1 then q3 alternated x6 (bench adjacency replicated — q1
      directly precedes q3 in BENCH_QUERIES)
  C : run the r13-changed neighbors (t11/t11b/t11c) once, then q3 x6
  A2: GC + settle, q3 x6
x2 cycles. Verdict rule: if all phase bests fall inside one band that
covers BOTH official numbers (0.33/0.385), the drift is ENVIRONMENTAL;
a reproducible B- or C-only slowdown indicts the adjacency instead.
"""

from __future__ import annotations

import gc
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from clickhouse_datafusion_spark.queries import QUERIES
from clickhouse_datafusion_spark.session import get_spark

SF = "/root/testdata/sf0.1"


def timed(spark, name, n):
    fn = QUERIES[name].spark_fn
    out = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn(spark, SF).toPandas()
        out.append(round(time.perf_counter() - t0, 4))
    return out


def main():
    spark = get_spark(app_name="probe_q3")
    spark.range(1000).selectExpr("sum(id)").collect()
    QUERIES["flagship_top_customers"].spark_fn(spark, SF).collect()
    warm = timed(spark, "q3_shipping_priority", 4)
    print("warmup:", warm)
    results = {}
    for cycle in (1, 2):
        a1 = timed(spark, "q3_shipping_priority", 6)
        b = []
        for _ in range(6):
            QUERIES["q1_pricing_summary"].spark_fn(spark, SF).toPandas()
            b += timed(spark, "q3_shipping_priority", 1)
        for nb in ("t11_bigram_lm_score", "t11b_bigram_lm_prebuilt",
                   "t11c_bigram_lm_shuffle"):
            QUERIES[nb].spark_fn(spark, SF).toPandas()
        c = timed(spark, "q3_shipping_priority", 6)
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(3)
        a2 = timed(spark, "q3_shipping_priority", 6)
        results[f"cycle{cycle}"] = {"quiet": a1, "after_q1": b,
                                    "after_t11_family": c,
                                    "post_cleanup": a2}
        for k, v in results[f"cycle{cycle}"].items():
            print(f"cycle{cycle} {k}: best={min(v)} "
                  f"median={sorted(v)[len(v)//2]} runs={v}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
