"""1000x embeddings probe: blocked_cosine_dups at 2M vectors.

Extends baseline_embeddings_100x.py's corpus scheme one more decade
(same per-shard seeded dimension permutation + ~1% planted near-dups of
shard-0), to answer the judge's actual question — does the blocked
near-dup plan scale LINEARLY across decades, or was 200k a lucky size?

Usage: python tools/probe_1000x.py [runs]
"""
import os
import random
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
from baseline_embeddings_100x import OFFSET, PLANT_RATE, SRC, THRESHOLD

OUT = "/root/repo/.tdcache/sf1000x_emb"
COPIES = 1000


def build() -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(OUT, "embeddings.parquet")
    marker = os.path.join(OUT, "_BUILT")
    if os.path.exists(marker):
        return path
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    src = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    ids = np.asarray(src.column("vec_id").to_pylist(), dtype=np.int64)
    labels = np.asarray(src.column("label").to_pylist(), dtype=np.int32)
    base = np.asarray(src.column("embedding").to_pylist(), dtype=np.float32)
    n, dim = base.shape
    writer = pq.ParquetWriter(path, src.schema)
    for i in range(COPIES):
        if i == 0:
            writer.write_table(src)
            continue
        rng = random.Random(i)
        perm = np.asarray(rng.sample(range(dim), dim))
        vecs = base[:, perm].copy()
        nrng = np.random.default_rng(i)
        planted = nrng.random(n) < PLANT_RATE
        if planted.any():
            noise = nrng.standard_normal((int(planted.sum()), dim),
                                         dtype=np.float32)
            noise /= np.linalg.norm(noise, axis=1, keepdims=True)
            bnorm = np.linalg.norm(base[planted], axis=1, keepdims=True)
            vecs[planted] = base[planted] + 0.25 * bnorm * noise
        writer.write_table(pa.table({
            "vec_id": pa.array(ids + i * OFFSET, type=pa.int64()),
            "embedding": pa.array(
                [v for v in vecs.tolist()],
                type=src.schema.field("embedding").type),
            "label": pa.array(labels, type=pa.int32()),
        }, schema=src.schema))
    writer.close()
    with open(marker, "w") as fh:
        fh.write("ok")
    return path


def main() -> None:
    from pyspark.sql import SparkSession

    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    path = build()
    spark = (SparkSession.builder.master(
                 f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.driver.memory", "48g")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .appName("probe1000x").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from clickhouse_datafusion_spark.operators.similarity import (
        blocked_cosine_dups, lsh_block_params)

    emb = spark.read.parquet(path)
    n_rows = emb.count()
    print(f"rows={n_rows} params={lsh_block_params(n_rows, THRESHOLD)}",
          flush=True)
    for i in range(runs):
        t0 = time.perf_counter()
        n = blocked_cosine_dups(emb, threshold=THRESHOLD, dim=64,
                                n_rows=n_rows).count()
        print(f"run{i}: {time.perf_counter()-t0:.1f}s n_pairs={n}",
              flush=True)


if __name__ == "__main__":
    main()
