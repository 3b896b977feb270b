"""Staged probe: where does blocked_cosine_dups spend time at scale?
Measures each stage separately at the given corpus (default 100x/200k).

Usage: python tools/probe_stages.py [1x|10x|100x] [stage...]
Stages: sig pairs distinct full (default: all)
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from baseline_embeddings_100x import OUTROOT, THRESHOLD, build
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

tag = sys.argv[1] if len(sys.argv) > 1 else "100x"
stages = set(sys.argv[2:]) or {"sig", "pairs", "distinct", "full"}
build()
spark = (SparkSession.builder.master(
             f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "24g")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .appName("probeStages").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from clickhouse_datafusion_spark.operators.dedup import _bucket_pairs
from clickhouse_datafusion_spark.operators.similarity import (
    blocked_cosine_dups, lsh_block_params, with_lsh_signatures)

emb = spark.read.parquet(os.path.join(OUTROOT, tag, "embeddings.parquet"))
dim = len(emb.select("embedding").first()[0])
n_rows = emb.count()
n_planes, n_tables = lsh_block_params(n_rows, THRESHOLD)
print(f"corpus={tag} rows={n_rows} planes={n_planes} tables={n_tables}",
      flush=True)


def timed(label, f):
    t0 = time.perf_counter()
    r = f()
    print(f"{label}: {time.perf_counter()-t0:.1f}s -> {r}", flush=True)
    return r


signed = with_lsh_signatures(emb, "embedding", n_planes, n_tables, dim, 42)
if "sig" in stages:
    timed("signatures",
          lambda: signed.select(F.sum(F.col("_sig_0"))).collect()[0][0])

banded = signed.select(
    F.col("vec_id").alias("id"),
    F.explode(F.array(*[F.xxhash64(F.lit(t), F.col(f"_sig_{t}"))
                        for t in range(n_tables)])).alias("bk"))
cand_dup = _bucket_pairs(banded, [])
if "pairs" in stages:
    timed("bucket_pairs_predistinct", lambda: cand_dup.count())
if "distinct" in stages:
    timed("candidates_distinct", lambda: cand_dup.distinct().count())
if "full" in stages:
    timed("full_blocked_cosine_dups",
          lambda: blocked_cosine_dups(emb, threshold=THRESHOLD, dim=dim,
                                      n_planes=n_planes,
                                      n_tables=n_tables).count())
