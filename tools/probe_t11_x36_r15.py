#!/usr/bin/env python
"""r15 A/B for two driver-wave levers, ONE session, alternating pairs:

- t11: grand-total () grouping set folded into the LM build aggregate
  (old: separate sum(c1) aggregate = two more serial AQE waves)
- x36: fixed-md5-domain bucket bounds in global_prefix_sum
  (old: per-call min/max aggregate = a data job at plan-build time)

Usage: python tools/probe_t11_x36_r15.py [iters]
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

    from pyspark.sql import functions as F

    from clickhouse_datafusion_spark.operators import packing, text
    from clickhouse_datafusion_spark.operators.stagecut import stage_cut
    from clickhouse_datafusion_spark.queries import QUERIES
    from clickhouse_datafusion_spark.session import get_spark

    spark = get_spark(app_name="probe_t11_x36_r15")
    spark.range(1000).selectExpr("sum(id)").collect()

    # ---- old t11 build (pre-r15: two-set grouping + separate total) ----
    new_build = text.build_bigram_lm

    def old_build(lm_df, text_col="text", id_col="doc_id",
                  alpha_num=2, alpha_den=5):
        from clickhouse_datafusion_spark.operators.dedup import (
            _ensure_parallelism)

        lm = _ensure_parallelism(lm_df, cpu_heavy=False)
        pairs = (text._hashed_sentinel_pairs(lm, text_col, id_col)
                 .filter(F.col("h1").isNotNull()))
        g = stage_cut(pairs.groupingSets([["h1", "h2"], ["h1"]],
                                         "h1", "h2")
                      .agg(F.expr("CAST(count(*) AS BIGINT) AS _c"),
                           F.grouping_id().alias("_gid")))
        bi_full = g.filter("_gid = 0").selectExpr("h1", "h2", "_c AS c2")
        uni = g.filter("_gid = 1").selectExpr("h1", "_c AS c1")
        total = uni.agg(F.expr("CAST(sum(c1) AS BIGINT) AS tot"))
        bi2 = (bi_full.filter(F.col("h2").isNotNull())
               .join(uni, "h1")
               .selectExpr("h1", "h2", "(c2 * 1000000) DIV c1 AS _seen"))
        bk = (uni.crossJoin(F.broadcast(total))
              .selectExpr("h1 AS h2",
                          f"({int(alpha_num)} * c1 * 1000000) "
                          f"DIV ({int(alpha_den)} * tot) AS _bo"))
        return bi2, bk

    # ---- old x36 bounds (pre-r15: min/max data job) ----
    new_gps = packing.global_prefix_sum

    def old_gps(df, value_col, order_col, n_buckets=None,
                out_col="_cum_before", bounds_mode="quantile"):
        if bounds_mode == "md5domain":
            bounds_mode = "uniform"
        return new_gps(df, value_col, order_col, n_buckets, out_col,
                       bounds_mode)

    arms = {
        "t11_bigram_lm_score": (
            lambda: setattr(text, "build_bigram_lm", old_build),
            lambda: setattr(text, "build_bigram_lm", new_build)),
        "x36_doc_bin_packing": (
            lambda: setattr(packing, "global_prefix_sum", old_gps),
            lambda: setattr(packing, "global_prefix_sum", new_gps)),
    }

    out = {}
    for entry, (use_old, use_new) in arms.items():
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
