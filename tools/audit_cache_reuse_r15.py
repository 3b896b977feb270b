#!/usr/bin/env python
"""r15 honesty audit (VERDICT r14 item 8): prove no bench entry leans on
cross-iteration CacheManager reuse (the x16 contamination class found and
removed in r14 — a session-wide ``persist()`` whose base plan silently
serves iterations 2+ from the first iteration's materialized blocks).

Method: in ONE session, run every bench entry twice under separate job
groups and compare the executed task counts. A result served from cache
re-plans to an InMemoryTableScan with (near) zero upstream tasks, so
iteration-2 tasks collapsing far below iteration-1 is the smoking gun.
Declared-semantics persists (t11b's prebuilt LM snapshot, s9/st11's ANN
index — the QUERY is "score against a persisted artifact") are expected
to show a first-call build that later calls skip; those entries are
listed in EXPECTED_STATEFUL with the reason, and for them the audit
asserts the opposite invariant: the *steady-state* calls (2nd vs 3rd)
must match each other.

Pass criterion per entry: tasks(run2) >= 0.5 * tasks(run1), or the entry
is in EXPECTED_STATEFUL and tasks(run3) >= 0.5 * tasks(run2).

Usage::

    python tools/audit_cache_reuse_r15.py [entry ...]
"""
from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from bench import BENCH_QUERIES  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Entries whose FIRST call legitimately builds a persisted artifact the
# query contract then reuses (documented asymmetric-by-design shapes,
# oracle-gated). For these the steady state is calls 2+.
EXPECTED_STATEFUL = {
    "t11b_bigram_lm_prebuilt": "prebuilt-LM snapshot store: the query IS "
                               "'score against the persisted LM'",
}


def run_once(spark, fn, group: str) -> dict:
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    fn(spark, SF).toPandas()
    sc.setJobGroup(None, None)
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
    return {"jobs": len(jobs), "stages": len(stages), "tasks": tasks}


def main() -> None:
    from clickhouse_datafusion_spark.queries import QUERIES
    from clickhouse_datafusion_spark.session import get_spark

    names = sys.argv[1:] or BENCH_QUERIES
    spark = get_spark(app_name="audit_cache_reuse_r15")
    spark.range(1000).selectExpr("sum(id)").collect()

    out, failures = {}, []
    for name in names:
        fn = QUERIES[name].spark_fn
        runs = [run_once(spark, fn, f"audit_{name}_{i}") for i in range(3)]
        stateful = name in EXPECTED_STATEFUL
        if stateful:
            ok = runs[2]["tasks"] >= 0.5 * runs[1]["tasks"]
        else:
            ok = runs[1]["tasks"] >= 0.5 * runs[0]["tasks"]
        out[name] = {"tasks": [r["tasks"] for r in runs],
                     "jobs": [r["jobs"] for r in runs],
                     "stateful": stateful, "ok": ok}
        if not ok:
            failures.append(name)
        print(f"# {name}: tasks {[r['tasks'] for r in runs]} "
              f"{'STATEFUL ' if stateful else ''}{'ok' if ok else 'SUSPECT'}",
              file=sys.stderr)
    path = os.path.join(HERE, "plans", "r15", "audit_cache_reuse.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"n": len(out), "suspect": failures}))
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
