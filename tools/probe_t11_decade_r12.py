"""r12 verdict task 3: re-measure t11 (bigram-LM scoring) at the
500k-doc decade on the FUSED LM build (the r11 localCheckpoint stage
cuts, now behind stage_cut). The pre-cut number was 2.44 s vs DuckDB
1.30 s (1.88×, BASELINE.md r7); the cut was A/B'd only at sf0.1.

Interleaved A/B in ONE session (the d8-decade protocol, commit
d75b552): arm A monkeypatches stage_cut to identity (the un-fused
pre-r11 body — every LM-table consumer recomputes the pair aggregate),
arm B is the shipped fused body. 3 runs per arm per cycle, 2 cycles,
plus the DuckDB oracle best-of-3 on the same corpus for the ratio.
Value identity between arms is asserted on the score sum.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

from baseline_pipeline_100x import OUT, build, link_other_tables

NAME = "t11_bigram_lm_score"


def main():
    from pyspark.sql import SparkSession

    from clickhouse_datafusion_spark.operators import stagecut
    from clickhouse_datafusion_spark.queries import QUERIES
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
             .appName("t11-decade").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    qd = QUERIES[NAME]
    orig_cut = stagecut.stage_cut

    def run():
        t0 = time.perf_counter()
        pdf = qd.spark_fn(spark, OUT).toPandas()
        return time.perf_counter() - t0, pdf

    # value identity across arms (one untimed run each)
    stagecut.stage_cut = lambda df, eager=False: df
    _, pa_ = run()
    stagecut.stage_cut = orig_cut
    _, pb_ = run()
    col = [c for c in pa_.columns if pa_[c].dtype.kind in "if"][-1]
    assert pa_[col].sum() == pb_[col].sum(), "arms disagree on values"
    print(f"value identity OK: sum({col}) = {pb_[col].sum()}")

    res = {"A_unfused": [], "B_fused": []}
    for cycle in range(2):
        for arm, patch in (("A_unfused", lambda df, eager=False: df),
                           ("B_fused", orig_cut)):
            stagecut.stage_cut = patch
            for _ in range(3):
                t, _ = run()
                res[arm].append(round(t, 3))
            stagecut.stage_cut = orig_cut
        print(f"cycle {cycle}: {res}")

    con = duckdb.connect()
    con.execute(f"SET threads={os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t_ in TABLES:
        con.execute(f"CREATE VIEW {t_} AS SELECT * FROM "
                    f"'{OUT}/{t_}.parquet'")
    con.execute(qd.oracle).df()  # warm
    duck = []
    for _ in range(3):
        t0 = time.perf_counter()
        con.execute(qd.oracle).df()
        duck.append(round(time.perf_counter() - t0, 3))

    b_best = min(res["B_fused"])
    print(json.dumps({
        "metric": "t11_decade_ab", "docs": 500_000,
        "A_unfused": res["A_unfused"], "B_fused": res["B_fused"],
        "duckdb": duck,
        "ratio_fused_vs_duckdb": round(b_best / min(duck), 2)}))


if __name__ == "__main__":
    main()
