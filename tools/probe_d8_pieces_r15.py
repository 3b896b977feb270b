#!/usr/bin/env python
"""r15: decompose d8's gram-pipeline cost at sf0.1 (guide §1.1) and
measure the width lever on its window stage, all within ONE session
using the noop sink (guide §1.4).

Pieces:
  toks   scan -> posexplode            (stage-37 work)
  lead   toks -> 19 LEAD columns       (window, no md5)
  gram   full g: window + concat + md5 (the stage-39 kernel)
  gramW  g with explicit repartition(W, id) on toks first
  gramD  g with docs repartitioned by id BEFORE posexplode (window
         exchange removed; text moves once, tokens never shuffle)
Usage: python tools/probe_d8_pieces_r15.py [W] [iters]
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
NGRAM = 20


def main() -> None:
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from pyspark.sql import functions as F

    from clickhouse_datafusion_spark.session import get_spark

    spark = get_spark(app_name="probe_d8_pieces_r15")
    spark.range(1000).selectExpr("sum(id)").collect()
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))

    def toks_of(src):
        return src.select(F.col("doc_id").alias("id"),
                          F.posexplode(F.split(F.col("text"), " "))
                          .alias("wpos0", "w"))

    lead_cols = ["id", "wpos0", "w AS w0"] + [
        f"lead(w, {k}) OVER (PARTITION BY id ORDER BY wpos0) AS w{k}"
        for k in range(1, NGRAM)]

    def gram_of(tk):
        return (tk.selectExpr(*lead_cols)
                .filter(F.col(f"w{NGRAM-1}").isNotNull())
                .selectExpr("id", "wpos0 + 1 AS gpos",
                            "md5(concat_ws(' ', "
                            f"{', '.join(f'w{k}' for k in range(NGRAM))}))"
                            " AS gh"))

    variants = {
        "toks": lambda: toks_of(docs),
        "lead": lambda: toks_of(docs).selectExpr(*lead_cols)
                .filter(F.col(f"w{NGRAM-1}").isNotNull())
                .selectExpr("id", "wpos0 + 1 AS gpos", "w0"),
        "gram": lambda: gram_of(toks_of(docs)),
        "gramW": lambda: gram_of(toks_of(docs).repartition(W, "id")),
        "gramD": lambda: gram_of(toks_of(
            docs.repartition(W, F.col("doc_id")))),
    }

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    for df in variants.values():
        run(df())  # warm everything once

    results = {}
    for i in range(iters):
        for name, build in variants.items():
            t0 = time.perf_counter()
            run(build())
            results.setdefault(name, []).append(time.perf_counter() - t0)
    out = {}
    for name, ts in results.items():
        out[name] = {"best": round(min(ts), 3),
                     "median": round(statistics.median(ts), 3),
                     "all": [round(t, 3) for t in ts]}
    # row counts for context
    out["n_tokens"] = toks_of(docs).count()
    out["n_grams"] = gram_of(toks_of(docs)).count()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
