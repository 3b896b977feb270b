#!/usr/bin/env python
"""r15 A/B: keyed widen (repartition by id — downstream id-reduce
exchange disappears) vs round-robin widen (r14), one session,
alternating pairs. Entries: d3 (minhash signature aggregate) and
t11b (LM scorer per-doc reduce).

Usage: python tools/probe_by_id_widen_r15.py [iters]
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


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    from clickhouse_datafusion_spark.operators import dedup
    from clickhouse_datafusion_spark.queries import QUERIES
    from clickhouse_datafusion_spark.session import get_spark

    spark = get_spark(app_name="probe_by_id_widen_r15")
    spark.range(1000).selectExpr("sum(id)").collect()

    new_ep = dedup._ensure_parallelism

    def old_ep(df, cpu_heavy=True, by=None):
        return new_ep(df, cpu_heavy=cpu_heavy, by=None)

    def use_old():
        dedup._ensure_parallelism = old_ep
        import clickhouse_datafusion_spark.operators.text as t
        # text.py imports the name at call time from dedup — patch both
        # just in case of from-imports inside function bodies (they
        # resolve dedup._ensure_parallelism at call time, so this is
        # already covered; kept for clarity)

    def use_new():
        dedup._ensure_parallelism = new_ep

    out = {}
    for entry in ("d3_minhash_lsh_candidates", "t11b_bigram_lm_prebuilt",
                  "t7_corpus_freq_score"):
        fn = QUERIES[entry].spark_fn
        use_old()
        old_rows = sorted(map(tuple, fn(spark, SF).collect()))
        use_new()
        new_rows = sorted(map(tuple, fn(spark, SF).collect()))
        assert old_rows == new_rows, f"{entry}: results differ!"
        t_old, t_new, ratios = [], [], []
        for i in range(iters):
            order = ((use_old, t_old), (use_new, t_new)) if i % 2 == 0 \
                else ((use_new, t_new), (use_old, t_old))
            pair = {}
            for setter, sink in order:
                setter()
                t0 = time.perf_counter()
                fn(spark, SF).toPandas()
                dt = time.perf_counter() - t0
                sink.append(dt)
                pair[id(sink)] = dt
            ratios.append(pair[id(t_old)] / pair[id(t_new)])
        use_new()
        out[entry] = {
            "old_best": round(min(t_old), 4),
            "new_best": round(min(t_new), 4),
            "old_median": round(statistics.median(t_old), 4),
            "new_median": round(statistics.median(t_new), 4),
            "speedup_pairwise_median": round(statistics.median(ratios), 3),
            "pair_ratios": [round(r, 3) for r in ratios],
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
