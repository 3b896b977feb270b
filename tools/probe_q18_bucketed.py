#!/usr/bin/env python
"""q18 over the re-attached bucketed layout at 600M rows (r10).

Companion to ``probe_q9_bucketed.py``: that probe writes the bucketed
facts (``spark-warehouse/q9b_{lineitem,orders}``, 128 buckets on
orderkey, 836 s one-time); THIS probe is what a later session does —
``layout.register_bucketed`` re-attaches the files (no rewrite) and
runs the q18 plan over them. q18's only full-table shuffle is the
lineitem-by-orderkey aggregate, which the bucketed scan feeds with
ZERO exchanges (asserted on the executed plan). Measured r10:
25.5 s vs 90.4 s default layout vs DuckDB 77.3 s — the engine beats
the oracle at the third decade on the deployed layout (BASELINE.md
r10b).

Usage: ``python tools/probe_q18_bucketed.py`` → one JSON line.
Requires the q9b_* tables from ``probe_q9_bucketed.py`` on disk.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

CORPUS = "/root/repo/.tdcache/sf100x_rel"
WAREHOUSE = "/root/repo/spark-warehouse"
N_BUCKETS = 128


def q18_from(spark, li, o, sf_dir):
    """The registry q18 plan body (queries.q18_bigvol) over externally
    supplied lineitem / orders relations."""
    import pyspark.sql.functions as F

    from clickhouse_datafusion_spark.queries import R2, t

    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(F.col("l_quantity").cast("decimal(28,4)")).alias("_q"))
           .filter(F.col("_q") > 300)
           .select("l_orderkey",
                   F.round("_q", 2).cast("double").alias("sum_qty")))
    return (o.join(big, o.o_orderkey == big.l_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .select("c_name", "o_orderkey",
                    F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
                    R2(F.col("o_totalprice")).alias("totalprice"),
                    "sum_qty")
            .orderBy(F.col("totalprice").desc(), "o_orderkey").limit(100))


def main() -> None:
    from clickhouse_datafusion_spark.operators.layout import (
        register_bucketed)
    from clickhouse_datafusion_spark.queries import QUERIES
    from clickhouse_datafusion_spark.session import get_spark

    for t_ in ("q9b_lineitem", "q9b_orders"):
        assert os.path.isdir(os.path.join(WAREHOUSE, t_)), \
            f"missing {t_}: run tools/probe_q9_bucketed.py first"
    spark = get_spark(app_name="probe_q18_bucketed")
    spark.sparkContext.setLogLevel("ERROR")
    register_bucketed(spark, "q18b_lineitem",
                      os.path.join(WAREHOUSE, "q9b_lineitem"),
                      ["l_orderkey"], n_buckets=N_BUCKETS)
    register_bucketed(spark, "q18b_orders",
                      os.path.join(WAREHOUSE, "q9b_orders"),
                      ["o_orderkey"], n_buckets=N_BUCKETS)

    def make():
        return q18_from(spark, spark.table("q18b_lineitem"),
                        spark.table("q18b_orders"), CORPUS)

    plan = make()._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(l_orderkey" not in plan, plan[:4000]

    best = float("inf")
    for _ in range(2):                # fresh DF per run — see q9 probe
        df = make()
        t0 = time.perf_counter()
        df.toPandas()
        best = min(best, time.perf_counter() - t0)

    a = make().toPandas()
    b = QUERIES["q18_large_volume_customers"].spark_fn(spark, CORPUS) \
        .toPandas()
    same = a.reset_index(drop=True).equals(b.reset_index(drop=True))
    print(json.dumps({"q18_bucketed_s": round(best, 2), "rows": len(a),
                      "orderkey_exchange_free": True,
                      "matches_default": bool(same)}))


if __name__ == "__main__":
    main()
