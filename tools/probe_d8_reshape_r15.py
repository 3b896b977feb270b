#!/usr/bin/env python
"""r15 d8 reshape A/B: the shipped doc-level repartition shape (text
moves once, token stream never shuffles, gram kernel at derived width)
vs the r14 shape (implicit token-stream exchanges, AQE-coalesced to
~4 reduce tasks at sf0.1), alternating in ONE session so box drift
cancels. Value identity asserted first.

Usage: python tools/probe_d8_reshape_r15.py [iters] [sf_dir]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _old_span_removal_positions(df, ngram, text_col, id_col):
    """The r14 shape: tokens shuffle via the implicit window exchange."""
    from pyspark.sql import functions as F

    from clickhouse_datafusion_spark.operators.stagecut import stage_cut

    ws = F.split(F.col(text_col), " ")
    toks = df.select(F.col(id_col).alias("id"),
                     F.posexplode(ws).alias("wpos0", "w"))
    lead_cols = ["id", "wpos0", "w AS w0"] + [
        f"lead(w, {k}) OVER (PARTITION BY id ORDER BY wpos0) AS w{k}"
        for k in range(1, ngram)]
    g = (toks.selectExpr(*lead_cols)
         .filter(F.col(f"w{ngram-1}").isNotNull())
         .selectExpr("id", "wpos0 + 1 AS gpos",
                     "md5(concat_ws(' ', "
                     f"{', '.join(f'w{k}' for k in range(ngram))})) AS gh"))
    g = stage_cut(g)
    n_salt = df.sparkSession.sparkContext.defaultParallelism
    keepers = (g.groupBy("gh")
               .agg(F.expr("min(struct(id, gpos)) AS _k"),
                    F.expr("count(*) AS _cnt"))
               .filter(F.col("_cnt") > 1)
               .selectExpr("gh", "_k.id AS _kid", "_k.gpos AS _kpos",
                           f"explode(sequence(0, {n_salt - 1})) AS _salt"))
    removals = (g.selectExpr(
                    "*",
                    f"CAST(pmod(xxhash64(id, gpos), {n_salt}) AS INT) "
                    "AS _salt")
                .selectExpr("*", "xxhash64(gh, _salt) AS _ghs")
                .join(keepers
                      .selectExpr("_kid", "_kpos",
                                  "xxhash64(gh, _salt) AS _ghs"),
                      "_ghs")
                .filter(F.expr("id != _kid OR gpos != _kpos"))
                .select("id", "gpos"))
    return (removals
            .selectExpr("id",
                        f"explode(sequence(gpos, gpos + {ngram - 1})) "
                        "AS wpos")
            .distinct())


def _old_affected(df, ws, rm_docs, id_col, F):
    return (df.select(F.col(id_col).alias("id"), ws.alias("ws"))
            .join(F.broadcast(rm_docs), "id", "left_semi"))


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    from pyspark.sql import functions as F

    from clickhouse_datafusion_spark.operators import dedup
    from clickhouse_datafusion_spark.queries import QUERIES
    from clickhouse_datafusion_spark.session import get_spark

    spark = get_spark(app_name="probe_d8_reshape_r15")
    spark.range(1000).selectExpr("sum(id)").collect()
    fn = QUERIES["d8_cross_doc_span_dedup"].spark_fn

    new_span = dedup._span_removal_positions
    new_rep = dedup._repartition_docs_by_id

    def use_old():
        dedup._span_removal_positions = _old_span_removal_positions
        dedup._repartition_docs_by_id = lambda df, id_col, **kw: df

    def use_new():
        dedup._span_removal_positions = new_span
        dedup._repartition_docs_by_id = new_rep

    use_old()
    old_rows = sorted(map(tuple, fn(spark, SF).collect()))
    use_new()
    new_rows = sorted(map(tuple, fn(spark, SF).collect()))
    assert old_rows == new_rows, "reshape changed results!"
    print(f"# identity ok: {len(new_rows)} rows", file=sys.stderr)

    t_old, t_new, ratios = [], [], []
    for i in range(iters):
        # alternate order within the pair so lag bias cancels
        order = (("old", t_old), ("new", t_new)) if i % 2 == 0 else \
                (("new", t_new), ("old", t_old))
        pair = {}
        for which, sink in order:
            use_old() if which == "old" else use_new()
            t0 = time.perf_counter()
            fn(spark, SF).toPandas()
            dt = time.perf_counter() - t0
            sink.append(dt)
            pair[which] = dt
        ratios.append(pair["old"] / pair["new"])
    use_new()
    print(json.dumps({
        "sf": SF, "iters": iters,
        "old_best": round(min(t_old), 4), "new_best": round(min(t_new), 4),
        "old_median": round(statistics.median(t_old), 4),
        "new_median": round(statistics.median(t_new), 4),
        "speedup_best": round(min(t_old) / min(t_new), 3),
        "speedup_pairwise_median": round(statistics.median(ratios), 3),
        "pair_ratios": [round(r, 3) for r in ratios],
        "old": [round(x, 3) for x in t_old],
        "new": [round(x, 3) for x in t_new],
    }))


if __name__ == "__main__":
    main()
