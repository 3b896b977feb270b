"""r14 (VERDICT task 8, stretch): 5M-doc (1000x) points for the two
composed heavy chains not yet probed at that corpus — x20
(corpus pipeline: dedup + quality + token stats composition) and d10
(paragraph dedup) — recorded as Spark-only decade factors against
their 500k-doc (100x) points, the same shape as r13's x56/d3x rows.

Run each entry at sf100x_docs then sf1000x_docs, best-of-N alternating
(100x, 1000x, 100x, 1000x, ...) in one session; prints one JSON line
per entry. A decade factor well above ~10 gets the d8 counterfactual
treatment next.

Usage: python tools/probe_heavy_5m_r14.py [entry ...]   (default both)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

C100 = "/root/repo/.tdcache/sf100x_docs"
C1000 = "/root/repo/.tdcache/sf1000x_docs"
ITERS = int(os.environ.get("PROBE_ITERS", "3"))


def main() -> None:
    from clickhouse_datafusion_spark.queries import QUERIES
    from clickhouse_datafusion_spark.session import get_spark

    entries = sys.argv[1:] or ["x20_corpus_pipeline",
                               "d10_paragraph_dedup"]
    spark = get_spark(app_name="probe_heavy_5m")
    spark.range(1000).selectExpr("sum(id)").collect()

    # materialize the WHOLE result but collect one row: a 5M-row text
    # result blows driver maxResultSize under toPandas; the per-row
    # xxhash64 + bit_xor agg forces the same computation and pins
    # value identity across iterations, order-independent.
    for name in entries:
        fn = QUERIES[name].spark_fn

        def measure(sf_dir):
            from pyspark.sql import functions as F

            df = fn(spark, sf_dir)
            hcols = [F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                     for c in df.columns]
            t0 = time.perf_counter()
            r = (df.select(F.xxhash64(*hcols).alias("h"))
                 .agg(F.count("*").alias("rows"),
                      F.expr("bit_xor(h)").alias("hash")).collect()[0])
            return (round(time.perf_counter() - t0, 2),
                    int(r["rows"]), int(r["hash"]))

        measure(C100)                               # warm-up, untimed
        t100, t1000 = [], []
        for _ in range(ITERS):
            w, rows100, h100 = measure(C100)
            t100.append(w)
            w, rows1000, h1000 = measure(C1000)
            t1000.append(w)
        b100, b1000 = min(t100), min(t1000)
        print(json.dumps({
            "entry": name,
            "best_100x_s": b100, "best_1000x_s": b1000,
            "decade_factor": round(b1000 / b100, 2),
            "rows_100x": rows100, "rows_1000x": rows1000,
            "all_100x": t100, "all_1000x": t1000,
        }))


if __name__ == "__main__":
    main()
