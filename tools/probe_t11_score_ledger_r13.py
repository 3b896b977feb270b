"""r13 verdict task 1 (phase 2): per-component ledger of t11's SCORING
pass at 500k docs (the breakdown probe showed score=2.63 s of the
2.95 s wall; LM build is 0.54 s of tiny-corpus job floor).

Components (noop-write to force full compute without collect):
  scan   — parquet scan of (doc_id, text)
  split  — + F.split(text,' ') and size()    (regex-split cost)
  pairs  — + arrays_zip/slice/explode        (fanout materialization)
  hash   — + xxhash64 per side               (the hp projection)
  joins  — + both broadcast probes
  agg    — + groupBy(doc_id) reduce          (the full operator, noop)
  full   — operator + toPandas               (what bench times)

Arm B re-runs the ledger with spark.sql.files.openCostInBytes=1m
(31 scan splits instead of 15 — Spark caps split size at
max(openCost, bytes/cores); a 59 MB single file on 32 cores defaults
to 4 MB splits = 15 tasks, idling half the box).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from baseline_pipeline_100x import OUT, build, link_other_tables


def mk_spark(open_cost: str | None):
    from pyspark.sql import SparkSession

    b = (SparkSession.builder.master(
             f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "24g")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.ui.enabled", "false"))
    if open_cost:
        b = b.config("spark.sql.files.openCostInBytes", open_cost)
    return b.appName("t11-score-ledger").getOrCreate()


def ledger(spark):
    from pyspark.sql import functions as F

    from clickhouse_datafusion_spark.operators.text import (
        _hashed_sentinel_pairs, build_bigram_lm, score_with_bigram_lm,
        words)
    from clickhouse_datafusion_spark.queries import t

    docs = t(spark, OUT, "documents").select("doc_id", "text")
    bi2, bk = build_bigram_lm(t(spark, OUT, "documents")
                              .filter(F.col("doc_id") < 250))
    bi2 = bi2.localCheckpoint(); bk = bk.localCheckpoint()

    ws = words("text")
    n = F.size(ws)
    z = F.arrays_zip(ws.alias("a"),
                     F.slice(ws, 2, F.greatest(n - 1, F.lit(0))).alias("b"))
    pairs = (docs.select(F.col("doc_id"), F.explode_outer(z).alias("_p"))
             .select("doc_id", "_p.a", "_p.b"))
    hp = _hashed_sentinel_pairs(docs, "text", "doc_id")
    joined = (hp.join(F.broadcast(bi2), ["h1", "h2"], "left")
              .join(F.broadcast(bk), "h2", "left")
              .select("doc_id",
                      F.when(F.col("h2").isNotNull(),
                             F.coalesce("_seen", "_bo", F.lit(0)))
                      .alias("_contrib")))
    full_df = score_with_bigram_lm(docs, bi2, bk)

    def noop(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def pandas(df):
        t0 = time.perf_counter()
        df.toPandas()
        return time.perf_counter() - t0

    comps = {
        "scan": lambda: noop(docs),
        "split": lambda: noop(docs.select("doc_id", F.size(ws).alias("n"))),
        "pairs": lambda: noop(pairs),
        "hash": lambda: noop(hp),
        "joins": lambda: noop(joined),
        "agg": lambda: noop(full_df),
        "full": lambda: pandas(full_df),
    }
    res = {k: [] for k in comps}
    for _ in range(3):
        for k, fn in comps.items():
            res[k].append(round(fn(), 3))
    return {k: min(v) for k, v in res.items()}, res


def main():
    for arm, oc in (("A_default", None), ("B_opencost1m", "1048576")):
        spark = mk_spark(oc)
        spark.sparkContext.setLogLevel("ERROR")
        build(); link_other_tables(OUT)
        best, allr = ledger(spark)
        print(f"\n=== {arm}: {best}")
        print(f"    all: {allr}")
        spark.stop()


if __name__ == "__main__":
    main()
