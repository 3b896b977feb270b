"""r14 (VERDICT task 1): pull the last lever on d8's 5M-doc
working-set ceiling — A/B the gram-stream stage-cut across storage
strategies, value-identical per arm, ONE ARM PER PROCESS (fresh JVM:
no block-manager or page-cache carry-over between arms; the driver
shell interleaves invocations).

Arms:
  local    localCheckpoint (current default; r13 measured 273.7 s)
  disk     persist(StorageLevel.DISK_ONLY) — lineage kept, blocks out
           of unified memory's storage pool contention
  parquet  parquetSpool (new stagecut mode) — column-compressed spool,
           cheapest possible re-read lineage
  memlow   localCheckpoint + spark.memory.fraction=0.3 (the memory-
           split counterfactual: shrink unified memory, hand the OS
           page cache the difference)
  memhigh  localCheckpoint + spark.memory.fraction=0.75

Each invocation prints ONE JSON line:
  {"arm":..., "wall_s":..., "rows":..., "sum_before":...,
   "sum_after":..., "text_hash":...}
The three checksums must be identical across arms (value identity).

Usage:
  for c in 1 2; do for a in local disk parquet memlow; do
    python tools/probe_d8_storage_r14.py $a; done; done
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

CORPUS = os.environ.get(
    "PROBE_D8_CORPUS",
    "/root/repo/.tdcache/sf1000x_docs/documents.parquet")

ARMS = {
    "local": ("localCheckpoint", None),
    "disk": ("diskPersist", None),
    "parquet": ("parquetSpool", None),
    "memlow": ("localCheckpoint", "0.3"),
    "memhigh": ("localCheckpoint", "0.75"),
}


def main() -> None:
    arm = sys.argv[1]
    mode, memfrac = ARMS[arm]
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    b = (SparkSession.builder.master(
             f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
         .appName(f"probe_d8_{arm}")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "48g")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false"))
    if memfrac is not None:
        b = b.config("spark.memory.fraction", memfrac)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.clickhouse_datafusion_spark.stageCut", mode)

    from clickhouse_datafusion_spark.operators.dedup import (
        drop_cross_doc_spans)

    df = spark.read.parquet(CORPUS).select("doc_id", "text")
    t0 = time.perf_counter()
    out = drop_cross_doc_spans(df)
    row = out.agg(
        F.count("*").alias("rows"),
        F.sum("n_words_before").alias("sum_before"),
        F.sum("n_words_after").alias("sum_after"),
        F.expr("bit_xor(xxhash64(doc_id, text))").alias("text_hash"),
    ).collect()[0]
    wall = time.perf_counter() - t0
    print(json.dumps({
        "arm": arm, "mode": mode, "mem_fraction": memfrac,
        "wall_s": round(wall, 1), "rows": row["rows"],
        "sum_before": int(row["sum_before"]),
        "sum_after": int(row["sum_after"]),
        "text_hash": int(row["text_hash"]),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
