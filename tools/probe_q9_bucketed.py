#!/usr/bin/env python
"""q9 bucketed-layout A/B at the 600M-row decade (r9 verdict task 1).

The r9b executed metrics showed q9's wall at 600M rows is the two-sided
orderkey exchange (1.6 GB + 1.6 GB) feeding the lineitem ⋈ orders
sort-merge join — scans, broadcasts, and the 175-group aggregate are
seconds. The repo already owns the scale-safe layout answer:
``layout.write_bucketed`` (the MergeTree ORDER-BY-part analog) makes
both fact tables storage-co-partitioned on orderkey, so the join reads
bucket-aligned files with ZERO exchanges. This probe measures exactly
that claim at the decade where it matters:

  A. default layout (plain parquet, the registry plan) — re-timed in
     this session for same-box comparability;
  B. default layout + the r9-recorded SHJ preference
     (``spark.sql.join.preferSortMergeJoin=false``, 128 partitions) —
     the adjudication the verdict asked for;
  C. bucketed layout (one-time ``write_bucketed`` on l_orderkey /
     o_orderkey, 128 buckets, one file per bucket) — with an executed-
     plan assertion that NO Exchange feeds the orderkey join.

Usage: ``python tools/probe_q9_bucketed.py`` → stderr progress +
one JSON line, recorded in BASELINE.md. Reuses the
``.tdcache/sf100x_rel`` corpus from probe_q9q18_100x; bucketed tables
land in ``./spark-warehouse`` (managed) and are rebuilt per run in the
same session (the write cost is itself reported — it is the price a
100 TB deployment pays ONCE for every downstream orderkey join).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

CORPUS = "/root/repo/.tdcache/sf100x_rel"
N_BUCKETS = 128


def q9_from(spark, li, o, sf_dir):
    """The registry q9 plan body over externally supplied lineitem /
    orders relations (queries.q9_profit with the fact sources swapped —
    dims keep the parquet path reads)."""
    import pyspark.sql.functions as F

    from clickhouse_datafusion_spark.queries import DEC, dsum_exact, t

    p = (t(spark, sf_dir, "part")
         .filter(F.col("p_name").like("%bolt%")).select("p_partkey"))
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    li = li.select("l_partkey", "l_suppkey", "l_orderkey",
                   "l_extendedprice", "l_discount")
    o = o.select("o_orderkey", "o_orderdate")
    return (li.join(p, li.l_partkey == p.p_partkey)
            .join(s, li.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(o, li.l_orderkey == o.o_orderkey)
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").cast("int").alias("o_year"))
            .agg(dsum_exact(DEC("l_extendedprice", 14, 2)
                            * (F.lit(1) - DEC("l_discount", 4, 2)))
                 .alias("profit")))


def best_of(k, make_df):
    """Best-of-k wall time of a FRESH DataFrame per run — re-running an
    action on the same DataFrame instance reuses its registered shuffle
    outputs (skipped stages) and times only the final stage, which is
    not a query time."""
    best = float("inf")
    for _ in range(k):
        df = make_df()
        t0 = time.perf_counter()
        df.toPandas()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    import pyspark.sql.functions as F

    from clickhouse_datafusion_spark.operators import layout
    from clickhouse_datafusion_spark.session import get_spark

    assert os.path.exists(os.path.join(CORPUS, "_BUILT")), \
        "run tools/probe_q9q18_100x.py --next first"
    res: dict[str, object] = {}
    spark = get_spark(app_name="probe_q9_bucketed")
    spark.sparkContext.setLogLevel("ERROR")

    def pq(name):
        return spark.read.parquet(os.path.join(CORPUS, f"{name}.parquet"))

    # -- A: default layout, registry plan ----------------------------
    def make_a():
        return q9_from(spark, pq("lineitem"), pq("orders"), CORPUS)

    res["default_s"] = round(best_of(2, make_a), 2)
    print(f"# A default: {res['default_s']}s", file=sys.stderr)

    # -- B: default layout + SHJ preference (the r9 recorded A/B) ----
    conf = spark.conf
    prev_smj = conf.get("spark.sql.join.preferSortMergeJoin", "true")
    prev_parts = conf.get("spark.sql.shuffle.partitions")
    try:
        conf.set("spark.sql.join.preferSortMergeJoin", "false")
        conf.set("spark.sql.shuffle.partitions", "128")
        res["shj128_s"] = round(best_of(2, make_a), 2)
    finally:
        conf.set("spark.sql.join.preferSortMergeJoin", prev_smj)
        conf.set("spark.sql.shuffle.partitions", prev_parts)
    print(f"# B shj128: {res['shj128_s']}s", file=sys.stderr)

    # -- C: bucketed layout (write once, then join exchange-free) ----
    t0 = time.perf_counter()
    for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        layout.write_bucketed(
            pq(name).repartition(N_BUCKETS, F.col(key)),
            f"q9b_{name}", [key], N_BUCKETS)
    res["bucketed_write_s"] = round(time.perf_counter() - t0, 2)
    print(f"# C write_bucketed: {res['bucketed_write_s']}s",
          file=sys.stderr)

    def make_c():
        return q9_from(spark, spark.table("q9b_lineitem"),
                       spark.table("q9b_orders"), CORPUS)

    df_c = make_c()
    plan = df_c._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(l_orderkey" not in plan, plan[:4000]
    assert "Exchange hashpartitioning(o_orderkey" not in plan, plan[:4000]
    res["orderkey_exchange_free"] = True
    res["n_exchanges"] = plan.count("Exchange ")
    res["bucketed_s"] = round(best_of(2, make_c), 2)
    print(f"# C bucketed: {res['bucketed_s']}s "
          f"(exchanges in plan: {res['n_exchanges']})", file=sys.stderr)

    # results must agree across all three physical strategies
    a = sorted(map(tuple, make_a().collect()))
    c = sorted(map(tuple, df_c.collect()))
    assert a == c, "bucketed plan changed the answer"
    res["rows"] = len(a)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
