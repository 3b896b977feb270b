#!/usr/bin/env python
"""r15 d10 reshape A/B: paragraph text crossing ONE exchange (doc-id
repartition, metadata-only ownership decision, co-partitioned
re-attach) vs the r14 shape (text through the _h join AND the id
rebuild). Two instruments:

- alternating one-session timing at sf0.1 (pairwise-median ratio);
- SHUFFLE BYTES WRITTEN per arm (statusTracker-free: summed from the
  event log) at any corpus — box-state-independent evidence that the
  heavy bytes now move once. Run with PROBE_CORPUS=.tdcache/sf100x_docs
  for the 500k-doc point.

Usage: python tools/probe_d10_reshape_r15.py [iters] [corpus_dir]
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


def _old_drop_duplicate_paragraphs(df, text_col="text", id_col="doc_id",
                                   sep="\n"):
    from pyspark.sql import functions as F

    from clickhouse_datafusion_spark.operators.dedup import (
        sql_ident, sql_str)

    qid, qtx, qsep = sql_ident(id_col), sql_ident(text_col), sql_str(sep)
    paras = (df.select(F.col(id_col),
                       F.posexplode(F.split(F.col(text_col), sep))
                       .alias("_pos", "_p"))
             .withColumn("_h", F.md5(F.col("_p"))))
    winners = (paras.groupBy("_h")
               .agg(F.expr(f"min(struct({qid} AS _i, _pos AS _o)) AS _w")))
    kept = (paras.join(winners, "_h")
            .filter(F.expr(f"{qid} = _w._i AND _pos = _w._o")))
    rebuilt = (kept.groupBy(F.col(id_col))
               .agg(F.expr(
                   "array_join(transform(sort_array(collect_list("
                   f"struct(_pos, _p))), x -> x._p), {qsep}) AS clean_text"),
                   F.expr("CAST(count(*) AS BIGINT) AS n_kept")))
    base = df.selectExpr(
        qid, f"CAST(size(split({qtx}, {qsep})) AS BIGINT) AS n_paras")
    return (base.join(rebuilt, id_col, "left")
            .selectExpr(qid, "n_paras",
                        "coalesce(n_kept, 0L) AS n_kept",
                        "coalesce(clean_text, '') AS clean_text"))


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    from pyspark.sql import functions as F

    from clickhouse_datafusion_spark.operators import dedup
    from clickhouse_datafusion_spark.session import get_spark

    spark = get_spark(app_name="probe_d10_reshape_r15")
    sc = spark.sparkContext
    spark.range(1000).selectExpr("sum(id)").collect()
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))

    new_fn = dedup.drop_duplicate_paragraphs
    old_fn = _old_drop_duplicate_paragraphs

    def checksum(fn):
        out = fn(docs, sep="\n")
        return out.agg(
            F.count("*"), F.sum("n_paras"), F.sum("n_kept"),
            F.expr("bit_xor(xxhash64(doc_id, clean_text))")).collect()[0]

    c_old, c_new = checksum(old_fn), checksum(new_fn)
    assert tuple(c_old) == tuple(c_new), (c_old, c_new)
    print(f"# identity ok: {tuple(c_new)}", file=sys.stderr)

    def run_tracked(fn, tag, i):
        group = f"{tag}_{i}"
        sc.setJobGroup(group, tag)
        t0 = time.perf_counter()
        fn(docs, sep="\n").write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        st = sc.statusTracker()
        tasks = 0
        for j in st.getJobIdsForGroup(group):
            ji = st.getJobInfo(j)
            if ji:
                for s in ji.stageIds:
                    si = st.getStageInfo(s)
                    if si:
                        tasks += si.numTasks
        return dt, tasks

    t_old, t_new, ratios = [], [], []
    for i in range(iters):
        order = ((old_fn, t_old), (new_fn, t_new)) if i % 2 == 0 else \
                ((new_fn, t_new), (old_fn, t_old))
        pair = {}
        for fn, sink in order:
            dt, _ = run_tracked(fn, "old" if fn is old_fn else "new", i)
            sink.append(dt)
            pair[id(sink)] = dt
        ratios.append(pair[id(t_old)] / pair[id(t_new)])
    print(json.dumps({
        "corpus": SF, "iters": iters,
        "old_best": round(min(t_old), 3), "new_best": round(min(t_new), 3),
        "old_median": round(statistics.median(t_old), 3),
        "new_median": round(statistics.median(t_new), 3),
        "speedup_pairwise_median": round(statistics.median(ratios), 3),
        "pair_ratios": [round(r, 3) for r in ratios],
    }))


if __name__ == "__main__":
    main()
