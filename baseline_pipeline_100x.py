#!/usr/bin/env python
"""Pipeline headliners at the next scale step: 100×-sf0.1 documents.

The j4 two-scale point (baseline_j4_100x.py) showed the relational
shuffle join crossing below DuckDB one decade up. This script asks the
same question for the TEXT-PIPELINE headliners — the operators that are
this engine's reason to exist at 100 TB: d3 (MinHash+LSH candidates),
t11 (bigram-LM scoring), x56 (the composed web-curation chain), with t1
(token counts) as the pure-scan control.

The 100× corpus (``.tdcache/sf100x_docs/documents.parquet``, 500k docs)
is built from 100 doc_id-shifted shards of sf0.1 with a PER-SHARD SEEDED
WORD PERMUTATION of each text. Why permute: identical copies would make
every document a 100-way exact/near dup, exploding LSH candidate pairs
~10,000× — a different (and unrealistic) workload. Permuting word order
preserves length/vocabulary/token statistics exactly (t1/t11 workloads
unchanged) while decorrelating shingles across shards, so d3 sees 100
independent corpora — the realistic shape of a big crawl. DuckDB runs
the same oracle on the same file, so the comparison stays apples-to-
apples at both scales.

Usage: ``python baseline_pipeline_100x.py [--rebuild]`` → markdown rows
+ one JSON line, recorded in BASELINE.md.
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
OUT = os.path.join(HERE, ".tdcache", "sf100x_docs")
COPIES = 100
OFFSET = 10_000_000

QUERY_SET = ["t1_token_counts", "d3_minhash_lsh_candidates",
             "t11_bigram_lm_score", "x56_web_curation",
             # r7 (VERDICT r6 task 7): the remaining heavy text operators
             # whose bodies the bind_once wave changed — measured here
             # against the oracle engine at both scales
             "t6_repetition_scores", "t9_bpe_pair_counts",
             "d8_cross_doc_span_dedup"]


def build(rebuild: bool = False) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    marker = os.path.join(OUT, "_BUILT")
    if os.path.exists(marker) and not rebuild:
        return OUT
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    src = pq.read_table(os.path.join(SRC, "documents.parquet"))
    cols = src.column_names
    texts = src.column("text").to_pylist()
    ids = src.column("doc_id").to_pylist()
    path = os.path.join(OUT, "documents.parquet")
    writer = pq.ParquetWriter(path, src.schema)
    for i in range(COPIES):
        if i == 0:
            writer.write_table(src)  # shard 0 is the original, verbatim
            continue
        rng = random.Random(i)  # deterministic per shard
        new_texts = []
        for txt in texts:
            words = txt.split(" ")
            rng.shuffle(words)
            new_texts.append(" ".join(words))
        arrays = []
        for c in cols:
            if c == "doc_id":
                arrays.append(pa.array([d + i * OFFSET for d in ids],
                                       type=src.schema.field("doc_id").type))
            elif c == "text":
                arrays.append(pa.array(new_texts,
                                       type=src.schema.field("text").type))
            else:
                arrays.append(src.column(c))
        writer.write_table(pa.table(arrays, schema=src.schema))
    writer.close()
    open(marker, "w").close()
    return OUT


def link_other_tables(out: str) -> None:
    """The pipeline queries only read documents, but loaders resolve the
    whole dir — symlink the rest at sf0.1 scale."""
    for f in os.listdir(SRC):
        if f.endswith(".parquet") and f != "documents.parquet":
            dst = os.path.join(out, f)
            if not os.path.exists(dst):
                os.symlink(os.path.join(SRC, f), dst)


def main() -> None:
    from pyspark.sql import SparkSession

    import duckdb

    from clickhouse_datafusion_spark.queries import QUERIES
    from tests.oracle_utils import TABLES

    global QUERY_SET
    only = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")]
    if only:
        QUERY_SET = [n for n in only[0].split(",") if n in QUERIES]

    build("--rebuild" in sys.argv)
    link_other_tables(OUT)
    spark = (SparkSession.builder.master(
                 f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "24g")
             .config("spark.sql.adaptive.enabled", "true")
             # bench.py's get_spark sets this too; without it toPandas
             # falls back to row-at-a-time conversion (~3 s for a 500k-row
             # result — it dominated every r6 100x ratio)
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .appName("pipeline-scale").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    for sf_label, d in (("sf0.1", SRC), ("sf100x_docs", OUT)):
        con = duckdb.connect()
        con.execute(f"SET threads={os.environ.get('SPARK_GRAFT_CPUS', '32')}")
        for t_ in TABLES:
            con.execute(f"CREATE VIEW {t_} AS SELECT * FROM "
                        f"'{d}/{t_}.parquet'")
        for name in QUERY_SET:
            qd = QUERIES[name]
            fn = qd.spark_fn
            # bench.py methodology: toPandas ↔ duckdb .df() — symmetric
            # Arrow interchange, full materialization (a bare .count()
            # lets Catalyst prune projection-only work entirely)
            fn(spark, d).toPandas()  # warm
            s_best = min(_timed(lambda: fn(spark, d).toPandas())
                         for _ in range(3))
            k_best: float | str | None = None
            if qd.oracle:
                # the oracle engine itself can fail at the 100× corpus
                # (d8's 20-gram explode OOMs DuckDB at 500k docs while
                # the Spark side completes) — record that, don't die
                try:
                    con.execute(qd.oracle).df()  # warm
                    k_best = min(_timed(lambda: con.execute(qd.oracle).df())
                                 for _ in range(3))
                except Exception as e:  # noqa: BLE001
                    k_best = f"ERROR: {type(e).__name__}"
            timed = isinstance(k_best, float)
            results.setdefault(name, {})[sf_label] = {
                "spark_sec": round(s_best, 3),
                "duckdb_sec": round(k_best, 3) if timed else k_best,
                "ratio": round(s_best / k_best, 2) if timed else None}
            print(f"| {name} {sf_label} | {s_best:.2f} | "
                  f"{round(k_best, 2) if timed else k_best} |",
                  file=sys.stderr)
        con.close()
    print(json.dumps({"metric": "pipeline_two_scale", "copies": COPIES,
                      "results": results}))


def _timed(f) -> float:
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
