#!/usr/bin/env python
"""r15 (VERDICT item 7): confirm the size-derived widen behaves off the
32-core box — run with SPARK_GRAFT_CPUS=8 (the driver's own low-core
protocol) and SPARK_GRAFT_CPUS=32, and for each widened entry read the
ACTUAL exchange width out of the plan (RoundRobinPartitioning(N) /
hashpartitioning(..., N)) plus the timed best-of-3.

What 'correct' looks like: width = min(ceil(scan_bytes/chunk), clamp)
is CORE-COUNT-INDEPENDENT until the clamp binds — at sf0.1 the derived
widths (2-5 for the light 256 KiB chunk, ~5 for 128 KiB, ~32 for the
16 KiB span-dedup chunk) should be IDENTICAL at 8 and 32 cores except
where defaultParallelism caps them (the span-dedup width: 36 -> capped
at 32 on 32 cores, at 8... no: cap is max(defaultParallelism,
shuffle.partitions), both 8 at c8 -> width 8).

Usage: SPARK_GRAFT_CPUS=8 python tools/probe_widen_c8_r15.py
"""
from __future__ import annotations

import io
import json
import os
import re
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

ENTRIES = ["t11_bigram_lm_score", "t11b_bigram_lm_prebuilt",
           "d3_minhash_lsh_candidates", "d8_cross_doc_span_dedup"]


def main() -> None:
    from clickhouse_datafusion_spark.queries import QUERIES
    from clickhouse_datafusion_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name=f"probe_widen_c{cpus}")
    spark.range(1000).selectExpr("sum(id)").collect()
    out = {"cpus": cpus}
    for e in ENTRIES:
        fn = QUERIES[e].spark_fn
        df = fn(spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        widths = sorted(set(
            int(m) for m in re.findall(r"RoundRobinPartitioning\((\d+)\)",
                                       plan)))
        hashw = sorted(set(
            int(m) for m in re.findall(
                r"hashpartitioning\([^)]*?, (\d+)\), REPARTITION_BY_NUM",
                plan)))
        fn(spark, SF).toPandas()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, SF).toPandas()
            ts.append(time.perf_counter() - t0)
        out[e] = {"rr_widths": widths, "repart_by_col_widths": hashw,
                  "best": round(min(ts), 3),
                  "all": [round(t, 3) for t in ts]}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
