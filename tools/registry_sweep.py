#!/usr/bin/env python
"""Full-registry in-session sweep — the driver-faithful gate replica run
over EVERY entry in ``queries.QUERIES`` at the driver's gate scale
(sf0.01), recorded per round as a ``SWEEP_r{N}`` line in COVERAGE.md
(r6 verdict task 5: the r6 ad-hoc sweep caught four latent gate errors
and verified changed plans before the driver could — make it a
mechanical artifact).

Usage::

    python tools/registry_sweep.py [entry ...]   # default: all entries

Prints one line per entry (PASS / NO_ORACLE / FAIL <err>) and a final
summary line ready to paste into COVERAGE.md. Exit code 1 if any entry
fails. Entries whose oracle is None get a rows-only check (the query
must execute and return a well-formed result), mirroring the driver.
"""
from __future__ import annotations

import os
import sys
import time
import traceback

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    from pyspark.sql import SparkSession

    from clickhouse_datafusion_spark.queries import QUERIES
    from tests.oracle_utils import compare, duckdb_conn

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "24g")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .appName("registry-sweep").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_conn(SF)

    names = sys.argv[1:] or list(QUERIES)
    t0 = time.time()
    n_pass = n_rows_only = 0
    failures: list[str] = []
    for i, name in enumerate(names, 1):
        qd = QUERIES[name]
        try:
            if qd.oracle is None:
                n = qd.spark_fn(spark, SF).count()
                assert n >= 0
                n_rows_only += 1
                print(f"[{i}/{len(names)}] {name} NO_ORACLE rows={n}",
                      flush=True)
            else:
                compare(qd.spark_fn(spark, SF), con, qd.oracle, name)
                n_pass += 1
                print(f"[{i}/{len(names)}] {name} PASS", flush=True)
        except Exception as e:  # noqa: BLE001 — sweep must reach the end
            failures.append(name)
            print(f"[{i}/{len(names)}] {name} FAIL {e}", flush=True)
            traceback.print_exc(limit=2)
    wall = time.time() - t0
    print(f"\nSWEEP: {len(names)} entries, {n_pass} hash-pass, "
          f"{n_rows_only} rows-only, {len(failures)} fail, "
          f"{wall:.0f}s wall")
    if failures:
        print("FAILED:", ", ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
