"""r13: t11 (bigram-LM scoring) one decade beyond the 500k-doc point —
5M docs (~59 MB/shard x 1000 shards of sf0.1), asking whether the
single-long-key fix's 1.13x at 500k keeps improving with depth (every
other floor-free 100x point sits at or under DuckDB; this is t11's
first 1000x point).

Corpus: the baseline_pipeline_100x scheme scaled with Spark itself —
1000 doc_id-shifted shards of sf0.1 documents, word order shuffled per
row (shard 0 verbatim). For t11 only length/vocabulary statistics
matter, and a uniform shuffle preserves both exactly; the per-shard
SEEDED permutation the 100x builder uses is a d3 (shingle
decorrelation) requirement, not a t11 one. The Spark-side build is
~1 min where the python-loop builder would take ~15; the shard parts
are then stream-merged into ONE parquet file with 64k-row groups so
both engines see the same layout the loaders expect.

Usage: python tools/probe_t11_1000x_r13.py [--rebuild]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/root/repo/.tdcache/sf1000x_docs"
COPIES = 1000
OFFSET = 10_000_000
NAME = "t11_bigram_lm_score"


def build(spark, rebuild: bool = False) -> str:
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    marker = os.path.join(OUT, "_BUILT")
    if os.path.exists(marker) and not rebuild:
        return OUT
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    src = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    cols = src.columns
    shards = spark.range(1, COPIES).select(F.col("id").alias("_shard"))
    permuted = (src.crossJoin(shards)
                .select(*[
                    (F.col("doc_id") + F.col("_shard") * OFFSET)
                    .alias("doc_id") if c == "doc_id"
                    else F.array_join(F.shuffle(F.split(F.col("text"), " ")),
                                      " ").alias("text") if c == "text"
                    else F.col(c) for c in cols]))
    parts = os.path.join(OUT, "_parts")
    src.select(*cols).unionByName(permuted).repartition(32) \
        .write.mode("overwrite").parquet(parts)
    # stream-merge into one file, many row groups (the layout the
    # loaders and DuckDB both read without directory-glob special cases)
    ds = pads.dataset(parts, format="parquet")
    writer = None
    path = os.path.join(OUT, "documents.parquet")
    for batch in ds.to_batches(batch_size=65536):
        if writer is None:
            writer = pq.ParquetWriter(path, batch.schema)
        writer.write_batch(batch)
    writer.close()
    shutil.rmtree(parts, ignore_errors=True)
    for f in os.listdir(SRC):
        if f.endswith(".parquet") and f != "documents.parquet":
            dst = os.path.join(OUT, f)
            if not os.path.exists(dst):
                os.symlink(os.path.join(SRC, f), dst)
    open(marker, "w").close()
    return OUT


def main() -> None:
    import duckdb

    from pyspark.sql import SparkSession

    from clickhouse_datafusion_spark.queries import QUERIES
    from tests.oracle_utils import TABLES

    spark = (SparkSession.builder.master(
                 f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.driver.memory", "48g")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .appName("t11-1000x").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, rebuild="--rebuild" in sys.argv)

    qd = QUERIES[NAME]
    n = spark.read.parquet(os.path.join(OUT, "documents.parquet")).count()
    print(f"corpus: {n} docs")

    sp = []
    for i in range(3):
        t0 = time.perf_counter()
        out = qd.spark_fn(spark, OUT)
        cnt = out.count()
        sp.append(round(time.perf_counter() - t0, 2))
        print(f"spark run {i}: {sp[-1]}s rows={cnt}")

    con = duckdb.connect()
    con.execute(f"SET threads={os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t_ in TABLES:
        con.execute(f"CREATE VIEW {t_} AS SELECT * FROM "
                    f"read_parquet('{OUT}/{t_}.parquet')")
    du = []
    for i in range(2):
        t0 = time.perf_counter()
        con.execute(qd.oracle).fetchall()
        du.append(round(time.perf_counter() - t0, 2))
        print(f"duckdb run {i}: {du[-1]}s")
    print(f"t11@5M: spark best {min(sp)}s vs duckdb best {min(du)}s "
          f"-> ratio {min(sp)/min(du):.2f}x (500k decade: 1.13x)")


if __name__ == "__main__":
    main()
