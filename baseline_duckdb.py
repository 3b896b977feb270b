#!/usr/bin/env python
"""Record a numeric single-node baseline for the headline bench queries.

The reference publishes no query benchmark numbers (see BASELINE.md), so the
measurable baseline is an independent best-in-class single-node OLAP engine —
DuckDB — running each headline query's oracle SQL on the SAME parquet files
at the SAME scale factor as bench.py. ``bench_vs_baseline`` is then
(our per-query seconds) / (DuckDB per-query seconds).

Prints one JSON line and a markdown table (for BASELINE.md). Usage:
    python baseline_duckdb.py [sf_dir] [iters]
"""

from __future__ import annotations

import json
import os
import sys
import time

from bench import BENCH_QUERIES

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import duckdb

    from clickhouse_datafusion_spark.queries import QUERIES

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    timings: dict[str, float | None] = {}
    for name in BENCH_QUERIES:
        oracle = QUERIES[name].oracle if name in QUERIES else None
        if not oracle:
            timings[name] = None  # rows-only query: no SQL-expressible oracle
            continue
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            con.execute(oracle).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(v for v in timings.values() if v is not None), 4)
    print(json.dumps({"metric": "duckdb_baseline_total_sec", "value": total,
                      "unit": "sec", "queries": timings,
                      "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
                      "threads": os.cpu_count()}))
    print("\n| query | duckdb_sec |\n|---|---|")
    for name, v in timings.items():
        print(f"| {name} | {v if v is not None else 'n/a (rows-only)'} |")
    print(f"| **total (oracle-expressible)** | **{total}** |")


if __name__ == "__main__":
    main()
