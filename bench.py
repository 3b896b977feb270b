#!/usr/bin/env python
"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Methodology mirrors the reference's benchmark harness shape
(/root/reference/examples/10_large_scale.rs:253-276 — multiple iterations,
best-of reporting) applied to the query set instead of inserts: per query,
ITERS timed runs (default 4) after one warm-up of the session; the headline
is the per-query minimum (steady state), with the median emitted alongside
so a noise-inflated run is distinguishable from a regression (this box
shows 2-20x swings on identical runs).
"""

from __future__ import annotations

import json
import os
import sys
import time

BENCH_QUERIES = [
    # relational headliners
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "flagship_top_customers",
    "j5_multiway",
    "a4_group_by_multi",
    "w3_rank_rownum",
    "o9_explode_unnest",
    "j4_self_join",
    # pipeline operators (dedup / similarity / text) at scale
    "d1_exact_dedup_groups",
    # d3 = the oracle-gated md5 gram-hash family; d3x = the production
    # xxhash64 family. Both are benched so a noisy cross-session gap
    # never reads as an operator regression. r12: d3x's registry body
    # gained the exact-verify projection (its hard gate), so its
    # timings from r12 on include the two broadcast verify joins and
    # are not directly comparable with r4-r11 numbers.
    "d3_minhash_lsh_candidates",
    "d3x_minhash_production",
    "t1_token_counts",
    "s1_cosine_topk",
    "x6_sessionization",
    "x1_asof_join",
    # r5b: the pipeline-engine story under the clock — BM25 corpus
    # selection (broadcast df/stats, one integer shuffle) and the composed
    # quality->dedup->split chain (one content-keyed shuffle total)
    "x16_bm25_scoring",
    "x20_corpus_pipeline",
    # r5d: the two heaviest new pipeline entries — bigram-LM scoring
    # (pair explode + LM joins + id reduce) and whole-doc bin packing
    # (distributed prefix sum)
    "t11_bigram_lm_score",
    # r7: the production LM shape — scoring against the persisted
    # snapshot-store LM (t11 minus the build; the steady-state filter a
    # crawl pipeline runs per shard). Its DuckDB twin rebuilds the LM
    # per run, so the ratio is asymmetric by design.
    "t11b_bigram_lm_prebuilt",
    "x36_doc_bin_packing",
    # r5e: corpus paragraph dedup (hash-keyed ownership aggregate) and
    # the composed web-curation chain (C4 lines -> paragraph dedup ->
    # taboo filter -> hashed classifier -> length-bucketed batches)
    "d10_paragraph_dedup",
    "x56_web_curation",
    # r8: the heaviest proven text operator (cross-doc span dedup) joins
    # the clock — its DuckDB twin OOMs at the 100x corpus but runs at
    # sf0.1, so this is the one entry whose scale story is an asymmetry
    # note (BASELINE.md r7/r8) rather than a ratio; and the embedding
    # near-dup path on the in-bucket Arrow gemm kernel (the r8 rework
    # that took 200k rows from non-terminating to ~36 s).
    "d8_cross_doc_span_dedup",
    "d5_embedding_dup_pairs",
    # r9: the two join-heavy relational headliners (r8 verdict task 7) —
    # Q9-style 5-table profit rollup and Q18-style heavy-agg subquery join
    "q9_product_profit",
    "q18_large_volume_customers",
]


def insert_benchmark(spark, rows: int, workers: int, iters: int) -> dict:
    """Insert-throughput harness mirroring the reference methodology
    (examples/10_large_scale.rs:71-101, 253-276): rows/sec over ≥3
    iterations, outlier-stripped average plus best-of; schema
    Int32/UInt64(→bigint)/Float64/Utf8; write_concurrency → workers."""
    import uuid

    from pyspark.sql import functions as F

    from clickhouse_datafusion_spark.sink import insert_into

    spark.sql("CREATE DATABASE IF NOT EXISTS bench")
    src = (spark.range(rows)
           .select(F.col("id").cast("int").alias("c_int32"),
                   (F.col("id") * 7).cast("bigint").alias("c_uint64"),
                   (F.col("id") * 1.5).alias("c_float64"),
                   F.concat(F.lit("val_"), F.col("id")).alias("c_utf8"))
           .cache())
    src.count()  # materialize the source outside the timed region
    rates = []
    for _ in range(iters):
        name = f"bench.ins_{uuid.uuid4().hex[:10]}"
        spark.sql(f"CREATE TABLE {name} (c_int32 INT, c_uint64 BIGINT, "
                  f"c_float64 DOUBLE, c_utf8 STRING) USING parquet")
        t0 = time.perf_counter()
        insert_into(spark, src, name, write_concurrency=workers)
        rates.append(rows / (time.perf_counter() - t0))
        spark.sql(f"DROP TABLE {name}")
    src.unpersist()
    stripped = sorted(rates)[1:-1] if len(rates) >= 3 else rates
    return {
        "rows": rows,
        "workers": workers,
        "rows_per_sec_avg": round(sum(stripped) / len(stripped)),
        "rows_per_sec_best": round(max(rates)),
    }


def concurrency_benchmark(spark, sf_dir: str, clients: int = 8,
                          reps: int = 3, bursts: int = 2) -> dict:
    """Multi-client throughput mirroring the reference's multi-client
    stress shape (/root/reference/tests/e2e_stress.rs): ``clients`` threads
    each run the flagship query ``reps`` times against the shared session
    (Spark's scheduler interleaves the jobs); reports queries/sec.

    r9 protocol fix: one UNTIMED warm-up burst, then best of ``bursts``
    timed bursts. The r8 verdict's qps drift (22 → 18.9 → 16.2 across
    rounds) adjudicated to a warm-up artifact, not a regression: a fresh
    session measured 11.96 / 17.32 / 20.29 / 23.22 qps on four
    consecutive bursts (r9 adjudication), so a single-shot burst after a
    variable-length query gauntlet was reporting the session's warm
    state, not the engine's concurrent throughput."""
    import threading

    from clickhouse_datafusion_spark.queries import QUERIES

    fn = QUERIES["flagship_top_customers"].spark_fn
    errors: list[Exception] = []

    def client():
        try:
            for _ in range(reps):
                fn(spark, sf_dir).collect()
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)

    def burst() -> float:
        threads = [threading.Thread(target=client) for _ in range(clients)]
        t0 = time.perf_counter()
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        return time.perf_counter() - t0

    burst()                           # warm-up, untimed
    elapsed = min(burst() for _ in range(bursts))
    if errors:
        raise errors[0]
    return {"clients": clients, "queries": clients * reps,
            "qps": round(clients * reps / elapsed, 2)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # ≥4 iterations: best-of-2 showed ±30% run-to-run noise on a shared box
    # (VERDICT r2 flagged phantom regressions on untouched queries)
    iters = int(os.environ.get("BENCH_ITERS", "4"))

    from clickhouse_datafusion_spark.queries import QUERIES
    from clickhouse_datafusion_spark.session import get_spark

    spark = get_spark(app_name="bench")

    # warm-up: JVM/codegen/parquet footer caches
    spark.range(1000).selectExpr("sum(id)").collect()
    QUERIES["flagship_top_customers"].spark_fn(spark, sf_dir).collect()

    extra = [q for q in os.environ.get("BENCH_EXTRA", "").split(",") if q]
    names = [n for n in BENCH_QUERIES + extra if n in QUERIES]
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name].spark_fn
        # per-QUERY warm-up (untimed), ADAPTIVE: queries with
        # Python/Arrow stages ramp their workers over the first
        # executions (measured on d3: 9.6 -> 4.1 -> 3.3 -> 1.0 s; the
        # r10 d3x adjudication measured the full ramp 2.9 -> 2.2 ->
        # 2.1 -> 1.9 -> 1.55 -> steady — FIVE executions to steady
        # state, so a fixed two warm-ups left the timed median
        # mid-ramp: q1 read median 2.11 vs best 0.64 in the r10d
        # session-start run). Warm until the latest run is within 15%
        # of the best warm run (min 2, max 5), so the timed window
        # starts at steady state and best ~= median on a quiet box.
        warm_times = []
        while True:
            w0 = time.perf_counter()
            fn(spark, sf_dir).toPandas()
            warm_times.append(time.perf_counter() - w0)
            # stop only when the newest run no longer improves on the
            # best of the PRIOR runs by >15% (r11, advice: comparing
            # against a min() that includes the latest run is vacuous
            # whenever the latest run IS the new best — it stopped a
            # monotonically improving ramp after 2 iterations)
            if len(warm_times) >= 5 or (
                    len(warm_times) >= 2
                    and warm_times[-1] >= 0.85 * min(warm_times[:-1])):
                break
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            # Arrow collection (toPandas) is the engine's columnar result
            # interchange and what the correctness gate itself uses. The
            # py4j row collect() measures per-row Python object
            # construction, not the engine: on a 1.3M-row result the plan
            # executes in 0.16 s while collect() takes 4+ s — and the
            # driver-heap churn it causes inflates SUBSEQUENT timings.
            fn(spark, sf_dir).toPandas()
            times.append(time.perf_counter() - t0)
        times.sort()
        timings[name] = round(times[0], 4)
        # median alongside best: this box shows 2-20x swings on identical
        # runs, so a single inflated iteration must be visible as such —
        # best ~= median means steady state, best << median means noise
        medians[name] = round(times[len(times) // 2], 4)
        print(f"# {name}: best {timings[name]:.3f}s "
              f"median {medians[name]:.3f}s", file=sys.stderr)

    result = {
        "metric": "headline_query_total_sec",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "value_median": round(sum(medians.values()), 4),
        "queries_median": medians,
        "iters": iters,
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
    }
    if os.environ.get("BENCH_CONCURRENT", "1") != "0":
        result["concurrent"] = concurrency_benchmark(
            spark, sf_dir,
            clients=int(os.environ.get("BENCH_CONCURRENT_CLIENTS", "8")))
    if os.environ.get("BENCH_INSERT", "1") != "0":
        result["insert"] = insert_benchmark(
            spark,
            rows=int(os.environ.get("BENCH_INSERT_ROWS", "1000000")),
            workers=int(os.environ.get("BENCH_INSERT_WORKERS", "16")),
            iters=int(os.environ.get("BENCH_INSERT_ITERS", "3")))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
