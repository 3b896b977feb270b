"""r13 verdict task 1 (phase 1): WHERE does t11's 2.70 s at the 500k-doc
decade go?  Before touching the LM build, split the wall into
(a) LM build+broadcast (tiny 250-doc corpus, pure job floor),
(b) the scoring pass over 500k docs (the compute), and
(c) the DuckDB oracle, same session.

Phases (best-of-3 each, interleaved with the oracle):
  full   — shipped t11 (build + score)
  score  — score_with_bigram_lm against PRE-MATERIALIZED LM tables
           (localCheckpointed before timing): the marginal scoring cost
  build  — build_bigram_lm + force both tables (count): the build cost
           WITHOUT the scoring pass (overlaps 'full' minus 'score'
           up to broadcast-build scheduling)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

from baseline_pipeline_100x import OUT, build, link_other_tables

def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from clickhouse_datafusion_spark.operators.text import (
        build_bigram_lm, score_with_bigram_lm)
    from clickhouse_datafusion_spark.queries import QUERIES, t
    from tests.oracle_utils import TABLES

    build()
    link_other_tables(OUT)
    spark = (SparkSession.builder.master(
                 f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "24g")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .appName("t11-breakdown").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    docs = t(spark, OUT, "documents")
    lm_src = docs.filter(F.col("doc_id") < 250)

    # pre-materialized LM (untimed)
    bi2_m, bk_m = build_bigram_lm(lm_src)
    bi2_m = bi2_m.localCheckpoint()
    bk_m = bk_m.localCheckpoint()
    print(f"LM sizes: bigrams={bi2_m.count()}, backoff={bk_m.count()}")

    qd = QUERIES["t11_bigram_lm_score"]

    def time_full():
        t0 = time.perf_counter()
        n = qd.spark_fn(spark, OUT).toPandas()
        return time.perf_counter() - t0

    def time_score():
        t0 = time.perf_counter()
        score_with_bigram_lm(docs, bi2_m, bk_m).toPandas()
        return time.perf_counter() - t0

    def time_build():
        t0 = time.perf_counter()
        bi2, bk = build_bigram_lm(lm_src)
        bi2.count(); bk.count()
        return time.perf_counter() - t0

    con = duckdb.connect()
    con.execute(f"SET threads={os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t_ in TABLES:
        con.execute(f"CREATE VIEW {t_} AS SELECT * FROM "
                    f"read_parquet('{OUT}/{t_}.parquet')")

    def time_duck():
        t0 = time.perf_counter()
        con.execute(qd.oracle).fetchall()
        return time.perf_counter() - t0

    res = {"full": [], "score": [], "build": [], "duckdb": []}
    for cyc in range(3):
        for name, fn in (("full", time_full), ("score", time_score),
                         ("build", time_build), ("duckdb", time_duck)):
            res[name].append(round(fn(), 3))
        print(f"cycle {cyc}: {res}")
    for k, v in res.items():
        print(f"{k}: best={min(v)} median={sorted(v)[len(v)//2]} all={v}")


if __name__ == "__main__":
    main()
