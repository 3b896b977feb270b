#!/usr/bin/env python
"""r15: per-stage wall/task-time breakdown for one bench entry, via the
Spark event log (the UI is disabled in this sandbox; the event log is
the same data). Runs the entry warm, parses stage submission/completion
and task-metric sums, prints a per-stage table so optimization targets
the stage that actually costs time (guide §1.1).

Usage: python tools/probe_stage_times_r15.py <entry> [warm_iters]
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    entry = sys.argv[1]
    warm = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    logdir = tempfile.mkdtemp(prefix="evlog_")
    from clickhouse_datafusion_spark.queries import QUERIES
    from clickhouse_datafusion_spark.session import get_spark

    spark = get_spark(app_name=f"stage_times_{entry}", extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": logdir,
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    })
    sc = spark.sparkContext
    spark.range(1000).selectExpr("sum(id)").collect()
    fn = QUERIES[entry].spark_fn
    for _ in range(warm):
        fn(spark, SF).toPandas()
    sc.setJobGroup("timed", entry)
    t0 = time.perf_counter()
    fn(spark, SF).toPandas()
    wall = time.perf_counter() - t0
    sc.setJobGroup(None, None)
    st = sc.statusTracker()
    timed_jobs = set(st.getJobIdsForGroup("timed"))
    app_id = sc.applicationId
    spark.stop()

    paths = []
    for f in os.listdir(logdir):
        full = os.path.join(logdir, f)
        if os.path.isdir(full):  # Spark 4 rolling layout eventlog_v2_<app>
            paths += [os.path.join(full, g) for g in sorted(os.listdir(full))
                      if g.startswith("events")]
        elif f.startswith(app_id):
            paths.append(full)
    stages = {}          # stageId -> dict
    stage_to_job = {}
    job_times = {}
    lines = []
    for p in paths:
        if p.endswith(".zstd"):
            import zstandard
            with open(p, "rb") as fb:
                data = zstandard.ZstdDecompressor().stream_reader(fb).read()
            lines += data.decode("utf-8", "replace").splitlines()
        else:
            with open(p) as ft:
                lines += ft.read().splitlines()
    if True:
        for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            k = ev.get("Event")
            if k == "SparkListenerJobStart":
                jid = ev["Job ID"]
                for s in ev.get("Stage Infos", []):
                    stage_to_job[s["Stage ID"]] = jid
                job_times[jid] = [ev.get("Submission Time"), None]
            elif k == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in job_times:
                    job_times[jid][1] = ev.get("Completion Time")
            elif k == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                d = stages.setdefault(sid, {
                    "exec_ms": 0, "cpu_ms": 0, "sr_ms": 0,
                    "srb": 0, "swb": 0, "input_b": 0})
                d.update({
                    "name": si["Stage Name"].split("\n")[0][:60],
                    "tasks": si["Number of Tasks"],
                    "sub": si.get("Submission Time"),
                    "comp": si.get("Completion Time"),
                })
            elif k == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                d = stages.get(sid)
                if d is None:
                    d = stages.setdefault(sid, {
                        "name": "?", "tasks": 0, "sub": None, "comp": None,
                        "exec_ms": 0, "cpu_ms": 0, "sr_ms": 0,
                        "srb": 0, "swb": 0, "input_b": 0})
                d["exec_ms"] += m.get("Executor Run Time", 0)
                d["cpu_ms"] += (m.get("Executor CPU Time", 0)) // 1000000
                sr = m.get("Shuffle Read Metrics") or {}
                sw = m.get("Shuffle Write Metrics") or {}
                d["sr_ms"] += sr.get("Fetch Wait Time", 0)
                d["srb"] += (sr.get("Local Bytes Read", 0)
                             + sr.get("Remote Bytes Read", 0))
                d["swb"] += sw.get("Shuffle Bytes Written", 0)
                im = m.get("Input Metrics") or {}
                d["input_b"] += im.get("Bytes Read", 0)

    timed_stages = {sid: d for sid, d in stages.items()
                    if stage_to_job.get(sid) in timed_jobs}
    print(f"# {entry}: timed wall {wall:.3f}s, "
          f"{len(timed_jobs)} jobs, {len(timed_stages)} stages")
    t_min = min(d["sub"] for d in timed_stages.values() if d["sub"])
    for sid in sorted(timed_stages):
        d = timed_stages[sid]
        dur = (d["comp"] - d["sub"]) if d["sub"] and d["comp"] else -1
        rel = (d["sub"] - t_min) if d["sub"] else -1
        print(f"stage {sid:4d} +{rel/1000:6.2f}s wall {dur/1000:6.2f}s "
              f"tasks {d['tasks']:4d} exec {d['exec_ms']/1000:6.2f}s "
              f"cpu {d['cpu_ms']/1000:6.2f}s "
              f"swb {d['swb']:>9d} srb {d['srb']:>9d} "
              f"in {d['input_b']:>9d}  {d['name']}")
    jt = sorted((v[0], v[1], k) for k, v in job_times.items()
                if k in timed_jobs and v[0] and v[1])
    for sub, comp, jid in jt:
        print(f"job {jid:4d} +{(sub - t_min)/1000:6.2f}s "
              f"wall {(comp - sub)/1000:6.2f}s")


if __name__ == "__main__":
    main()
