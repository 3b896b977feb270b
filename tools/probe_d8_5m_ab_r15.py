#!/usr/bin/env python
"""r15: d8 at 5M docs, OLD (r14 token-exchange) vs NEW (r15 doc-id
reshape) code, parquetSpool stage cut, ONE ARM PER FRESH JVM — the
wrapper shell interleaves arms so box drift is shared. Checksums must
match across arms.

Usage: python tools/probe_d8_5m_ab_r15.py <old|new> [corpus]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

CORPUS = sys.argv[2] if len(sys.argv) > 2 else \
    "/root/repo/.tdcache/sf1000x_docs/documents.parquet"


def main() -> None:
    arm = sys.argv[1]
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master(
                 f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
             .appName(f"probe_d8_5m_{arm}")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "48g")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.clickhouse_datafusion_spark.stageCut",
                   "parquetSpool")

    from clickhouse_datafusion_spark.operators import dedup

    if arm == "old":
        sys.path.insert(0, "/root/repo/tools")
        from probe_d8_reshape_r15 import _old_span_removal_positions
        dedup._span_removal_positions = _old_span_removal_positions
        dedup._repartition_docs_by_id = lambda df, id_col, **kw: df

    df = spark.read.parquet(CORPUS).select("doc_id", "text")
    t0 = time.perf_counter()
    out = dedup.drop_cross_doc_spans(df)
    row = out.agg(
        F.count("*").alias("rows"),
        F.sum("n_words_before").alias("sum_before"),
        F.sum("n_words_after").alias("sum_after"),
        F.expr("bit_xor(xxhash64(doc_id, text))").alias("text_hash"),
    ).collect()[0]
    wall = time.perf_counter() - t0
    print(json.dumps({"arm": arm, "wall_s": round(wall, 1),
                      "rows": row["rows"],
                      "sum_before": row["sum_before"],
                      "sum_after": row["sum_after"],
                      "text_hash": row["text_hash"]}))


if __name__ == "__main__":
    main()
