"""r13: fleet-wide audit for the UnsafeHashedRelation probe tax.

The t11 decade fix showed a multi-column hash-join probe costs 5-7x a
single-bigint probe (LongHashedRelation fast path) and is INVISIBLE in
the plan text. This audit runs every registry entry's plan at sf0.001
and reports entries whose executed plan carries multi-key
BroadcastHashJoin/ShuffledHashJoin probes, with their bench weight
where one exists — the shortlist for fold-or-justify.

Usage: python tools/audit_multikey_joins_r13.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    from pyspark.sql import SparkSession

    from clickhouse_datafusion_spark.plans.explain import plan_report
    from clickhouse_datafusion_spark.queries import QUERIES

    spark = (SparkSession.builder.master(
                 f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false")
             .appName("audit-multikey").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    hits, errors = {}, {}
    for name, qd in QUERIES.items():
        try:
            rep = plan_report(qd.spark_fn(spark, SF), execute=True)
            if rep["multikey_hash_joins"] > 0:
                hits[name] = rep["multikey_hash_joins"]
        except Exception as e:
            errors[name] = f"{type(e).__name__}: {str(e)[:120]}"
    print(json.dumps({"sf": SF, "entries": len(QUERIES),
                      "multikey_join_entries": hits,
                      "plan_errors": errors}, indent=2))


if __name__ == "__main__":
    main()
