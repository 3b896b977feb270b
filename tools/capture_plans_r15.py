#!/usr/bin/env python
"""r15 optimization round: capture .explain("formatted") for every bench
entry into plans/r15/<query>_<tag>.txt, plus a per-entry ledger of

- construction time (spark_fn call: py4j plan building + any eager jobs),
- first-analysis time (schema access forces analysis),
- warm execution time (bench-faithful toPandas, best of N),
- job / stage / task counts for one executed run.

Usage::

    python tools/capture_plans_r15.py before [entry ...]
"""
from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from bench import BENCH_QUERIES  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ITERS = int(os.environ.get("PLAN_ITERS", "4"))


def main() -> None:
    from clickhouse_datafusion_spark.queries import QUERIES
    from clickhouse_datafusion_spark.session import get_spark

    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or BENCH_QUERIES
    outdir = os.path.join(HERE, "plans", "r15")
    os.makedirs(outdir, exist_ok=True)

    spark = get_spark(app_name=f"plans_r15_{tag}")
    sc = spark.sparkContext
    spark.range(1000).selectExpr("sum(id)").collect()
    QUERIES["flagship_top_customers"].spark_fn(spark, SF).collect()

    ledger = {}
    for name in names:
        fn = QUERIES[name].spark_fn
        # cold-ish construction (first call may trigger eager stage cuts)
        t0 = time.perf_counter()
        df = fn(spark, SF)
        t_construct0 = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = df.schema  # force analysis
        t_analyze = time.perf_counter() - t0
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        # bench-faithful warm-up (adaptive, as bench.py)
        warm = []
        while True:
            w0 = time.perf_counter()
            fn(spark, SF).toPandas()
            warm.append(time.perf_counter() - w0)
            if len(warm) >= 5 or (len(warm) >= 2
                                  and warm[-1] >= 0.85 * min(warm[:-1])):
                break
        # warm construction cost (plan building alone, no action)
        t0 = time.perf_counter()
        df2 = fn(spark, SF)
        _ = df2.schema
        t_construct_warm = time.perf_counter() - t0
        # timed runs with job accounting
        best, best_ledger = None, None
        times = []
        for i in range(ITERS):
            group = f"{name}_{tag}_{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            fn(spark, SF).toPandas()
            wall = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            times.append(wall)
            if best is None or wall < best:
                st = sc.statusTracker()
                jobs = st.getJobIdsForGroup(group)
                stages, tasks = set(), 0
                for j in jobs:
                    ji = st.getJobInfo(j)
                    if ji:
                        for s in ji.stageIds:
                            si = st.getStageInfo(s)
                            if si and s not in stages:
                                stages.add(s)
                                tasks += si.numTasks
                best = wall
                best_ledger = {"jobs": len(jobs), "stages": len(stages),
                               "tasks": tasks}
        times.sort()
        ledger[name] = {
            "construct_cold_s": round(t_construct0, 4),
            "analyze_s": round(t_analyze, 4),
            "construct_warm_s": round(t_construct_warm, 4),
            "best_s": round(times[0], 4),
            "median_s": round(times[len(times) // 2], 4),
            **best_ledger,
        }
        print(f"# {name}: construct {t_construct_warm:.3f}s "
              f"best {times[0]:.3f}s median {times[len(times)//2]:.3f}s "
              f"jobs {best_ledger['jobs']} stages {best_ledger['stages']} "
              f"tasks {best_ledger['tasks']}", file=sys.stderr)
    with open(os.path.join(outdir, f"ledger_{tag}.json"), "w") as f:
        json.dump(ledger, f, indent=1)
    print(json.dumps({"tag": tag, "n": len(ledger)}))


if __name__ == "__main__":
    main()
