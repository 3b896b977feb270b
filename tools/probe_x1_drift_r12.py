"""r12 verdict task 1: adjudicate the x1_asof_join bench drift
(+36% best / +25% median in BENCH_r11 with operators/asof.py untouched).

Two hypotheses:
  (E) environmental — the documented same-box noise band (unchanged d3
      timed 1.14 vs 1.46 s in two official r11 runs 40 min apart);
  (N) neighbor effect — the r11 d8/t11 localCheckpoint cuts leave
      executor-storage blocks resident in the shared bench session,
      shifting later x1 iterations.

Protocol (the o9-r10 interleaved template): ONE session, bench-identical
warm-up, then alternating blocks —
  phase A1: x1 ×6 in a quiet session
  phase B : run d8 + t11 + t11b + t11c once each (their stage-cut
            blocks now resident), then x1 ×6 immediately after
  phase A2: force cleanup (GC + a settle pause), x1 ×6 again
repeated twice. If B ≈ A within each cycle, the neighbor effect is
absent and the r11 movement is environmental; a reproducible B-only
slowdown indicts the stage cuts' storage pressure.
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
    spark = get_spark(app_name="probe_x1")
    spark.range(1000).selectExpr("sum(id)").collect()
    QUERIES["flagship_top_customers"].spark_fn(spark, SF).collect()
    # bench-faithful adaptive warm-up of x1 itself
    warm = timed(spark, "x1_asof_join", 4)
    print("warmup:", warm)
    results = {}
    for cycle in (1, 2):
        a1 = timed(spark, "x1_asof_join", 6)
        for nb in ("d8_cross_doc_span_dedup", "t11_bigram_lm_score",
                   "t11b_bigram_lm_prebuilt", "t11c_bigram_lm_shuffle"):
            QUERIES[nb].spark_fn(spark, SF).toPandas()
        b = timed(spark, "x1_asof_join", 6)
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(3)
        a2 = timed(spark, "x1_asof_join", 6)
        results[f"cycle{cycle}"] = {"quiet": a1, "after_neighbors": b,
                                    "post_cleanup": a2}
        for k, v in results[f"cycle{cycle}"].items():
            print(f"cycle{cycle} {k}: best={min(v)} "
                  f"median={sorted(v)[len(v)//2]} runs={v}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
