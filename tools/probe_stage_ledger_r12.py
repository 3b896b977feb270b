"""r12 verdict task 8: per-entry stage ledger for the remaining >0.9 s
bench entries (d8, x56, t11, d3, d3x) at sf0.1.

With the ~0.2 s/stage scheduling floor measured in r11 (BASELINE.md),
the only legitimate sf0.1 lever left is STAGE COUNT. This tool runs
each entry in its own job group and reads the status tracker: jobs,
distinct stages, tasks, wall (best of 3 after bench-faithful warm-up).
The ledger feeds the residual-=-floor accounting: entries whose stage
count is already at the plan's theoretical minimum are floor-bound and
recorded as such, not re-tuned.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ENTRIES = [
    "d8_cross_doc_span_dedup", "x56_web_curation", "t11_bigram_lm_score",
    "d3_minhash_lsh_candidates", "d3x_minhash_production",
]


def main():
    from clickhouse_datafusion_spark.queries import QUERIES
    from clickhouse_datafusion_spark.session import get_spark

    spark = get_spark(app_name="stage_ledger")
    sc = spark.sparkContext
    spark.range(1000).selectExpr("sum(id)").collect()
    QUERIES["flagship_top_customers"].spark_fn(spark, SF).collect()

    out = {}
    for name in ENTRIES:
        fn = QUERIES[name].spark_fn
        # bench-faithful adaptive warm-up
        warm = []
        while True:
            t0 = time.perf_counter()
            fn(spark, SF).toPandas()
            warm.append(time.perf_counter() - t0)
            if len(warm) >= 5 or (len(warm) >= 2
                                  and warm[-1] >= 0.85 * min(warm[:-1])):
                break
        best, ledger = None, None
        for i in range(3):
            group = f"{name}_{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            fn(spark, SF).toPandas()
            wall = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            st = sc.statusTracker()
            jobs = st.getJobIdsForGroup(group)
            stages, tasks = set(), 0
            for j in jobs:
                ji = st.getJobInfo(j)
                if ji is None:
                    continue
                for s in ji.stageIds:
                    si = st.getStageInfo(s)
                    if si is not None and si.numTasks > 0:
                        stages.add(s)
                        tasks += si.numTasks
            if best is None or wall < best:
                best = wall
                ledger = {"jobs": len(jobs), "stages": len(stages),
                          "tasks": tasks}
        out[name] = {"best_s": round(best, 3), **ledger,
                     "floor_s_est": round(ledger["stages"] * 0.2, 1)}
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
