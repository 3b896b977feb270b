#!/usr/bin/env python
"""Embedding near-dup pipeline at scale: 1× / 10× / 100× sf0.1 embeddings.

baseline_pipeline_100x.py answered the two-scale question for the TEXT
headliners; this script does the same for the EMBEDDING side — the
LSH-blocked cosine pair path (`similarity.blocked_cosine_dups`, reworked
in r7b: bare-id candidates + join-back scoring + auto-sized planes/
tables) and the composed SemDeDup chain (`similarity.semantic_dedup`).
These are the operators whose naive form is QUADRATIC: the exact
all-pairs oracle that gates them at sf0.01 stops being runnable long
before 100 TB, so the scale story must be measured, not asserted.

Corpus (``.tdcache/sf100x_emb/``): 100 vec_id-shifted shards of sf0.1's
embeddings (2k rows → 200k). Shard 0 is verbatim; shard i applies a
PER-SHARD SEEDED DIMENSION PERMUTATION of every vector — norms and
intra-shard cosines are exactly preserved (same workload statistics)
while cross-shard cosines decorrelate to near-random, so the corpus is
100 independent populations rather than a 100-way duplicate explosion
(same reasoning as the word permutation in baseline_pipeline_100x.py).
On top of that, ~1% of each shard's rows are PLANTED near-dups of a
shard-0 vector (v + 0.25·|v|·gaussian → cos ≈ 0.97): the near-dup
workload at threshold 0.9 is then non-trivial at every scale, and the
planted pairs give the recall check real pairs to find.

Measured per scale point (1× = 2k, 10× = 20k, 100× = 200k rows):

- Spark `blocked_cosine_dups(threshold=0.9, auto-sized)` wall time;
- Spark `semantic_dedup` (pairs → connected components → keep) wall;
- DuckDB exact all-pairs oracle wall at 1× and 10× (2M / 200M candidate
  pairs); at 100× the oracle is 2·10¹⁰ pairs — recorded as
  QUADRATIC-INFEASIBLE with the 10×-measured time × 100 as the floor
  estimate rather than burning an hour proving a join is quadratic;
- recall of the blocked pair set against the exact oracle wherever the
  oracle runs (auto-sizer contract: ≥ 0.999 at the threshold cosine).

Usage: ``python baseline_embeddings_100x.py [--rebuild]`` → markdown
rows + one JSON line, recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUTROOT = os.path.join(HERE, ".tdcache", "sf100x_emb")
OFFSET = 10_000_000
THRESHOLD = 0.9
PLANT_RATE = 0.01
SCALES = (("1x", 1), ("10x", 10), ("100x", 100))


def build(rebuild: bool = False) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    marker = os.path.join(OUTROOT, "_BUILT")
    if os.path.exists(marker) and not rebuild:
        return
    shutil.rmtree(OUTROOT, ignore_errors=True)
    src = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    ids = np.asarray(src.column("vec_id").to_pylist(), dtype=np.int64)
    labels = np.asarray(src.column("label").to_pylist(), dtype=np.int32)
    base = np.asarray(src.column("embedding").to_pylist(), dtype=np.float32)
    n, dim = base.shape
    for tag, copies in SCALES:
        out = os.path.join(OUTROOT, tag)
        os.makedirs(out, exist_ok=True)
        path = os.path.join(out, "embeddings.parquet")
        writer = pq.ParquetWriter(path, src.schema)
        for i in range(copies):
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
        # loaders resolve the whole dir — symlink the other tables
        for f in os.listdir(SRC):
            if f.endswith(".parquet") and f != "embeddings.parquet":
                dst = os.path.join(out, f)
                if not os.path.exists(dst):
                    os.symlink(os.path.join(SRC, f), dst)
    with open(marker, "w") as fh:
        fh.write("ok")


ORACLE = f"""
    WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings)
    SELECT a.id AS id_a, b.id AS id_b
    FROM v a JOIN v b ON a.id < b.id
    WHERE FLOOR(list_dot_product(a.v, b.v)
                / (sqrt(list_dot_product(a.v, a.v))
                   * sqrt(list_dot_product(b.v, b.v)))
                * 10000 + 0.5) / 10000.0 >= {THRESHOLD}
"""


def _timed(f):
    t0 = time.perf_counter()
    r = f()
    return time.perf_counter() - t0, r


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    from clickhouse_datafusion_spark.operators.similarity import (
        blocked_cosine_dups, semantic_dedup)

    build("--rebuild" in sys.argv)
    spark = (SparkSession.builder.master(
                 f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "24g")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .appName("embeddings-scale").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    duck_10x = None
    for tag, copies in SCALES:
        d = os.path.join(OUTROOT, tag)
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        dim = len(emb.select("embedding").first()[0])

        def pairs_run():
            return blocked_cosine_dups(emb, threshold=THRESHOLD,
                                       dim=dim).toPandas()

        def sem_run():
            return semantic_dedup(emb, threshold=THRESHOLD,
                                  dim=dim).toPandas()

        pairs_run()  # warm (also runs the auto-size count job)
        s_pairs = min(_timed(pairs_run)[0] for _ in range(3))
        _, pair_df = _timed(pairs_run)
        sem_run()
        s_sem = min(_timed(sem_run)[0] for _ in range(3))

        k_sec: float | str
        recall = None
        if copies < 100:
            con = duckdb.connect()
            con.execute(f"SET threads={os.environ.get('SPARK_GRAFT_CPUS', '32')}")
            con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                        f"'{d}/embeddings.parquet'")
            k_sec, exact = _timed(lambda: con.execute(ORACLE).df())
            exact_set = set(zip(exact["id_a"], exact["id_b"]))
            got = set(zip(pair_df["id_a"], pair_df["id_b"]))
            recall = (len(got & exact_set) / len(exact_set)
                      if exact_set else 1.0)
            if copies == 10:
                duck_10x = k_sec
            con.close()
        else:
            est = duck_10x * 100 if duck_10x else None
            k_sec = (f"QUADRATIC-INFEASIBLE (est ≥ {est:.0f}s = 10x × 100)"
                     if est else "QUADRATIC-INFEASIBLE")
        results[tag] = {
            "rows": 2000 * copies,
            "spark_pairs_sec": round(s_pairs, 3),
            "spark_semdedup_sec": round(s_sem, 3),
            "duckdb_exact_sec": round(k_sec, 3)
            if isinstance(k_sec, float) else k_sec,
            "n_pairs": int(len(pair_df)),
            "recall_vs_exact": round(recall, 5) if recall is not None else None,
        }
        print(f"| {tag} ({2000*copies} rows) | {s_pairs:.2f} | {s_sem:.2f} | "
              f"{k_sec if isinstance(k_sec, str) else round(k_sec, 2)} | "
              f"{len(pair_df)} | {recall} |", file=sys.stderr)
    print(json.dumps({"metric": "embeddings_two_scale",
                      "threshold": THRESHOLD, "results": results}))


if __name__ == "__main__":
    main()
