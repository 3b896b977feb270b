#!/usr/bin/env python
"""q9/q18 at the NEXT scale step (r9): 100×-sf0.1 facts.

The two r9 join-heavy headliners are benched at sf0.1 and sf1x (10×);
this probe extends them one more decade — 60M-row lineitem ⋈ 15M-row
orders — the j4 treatment (baseline_j4_100x.py) applied to the queries
whose scale story is multi-table. Corpus (``.tdcache/sf10x_rel``): 10
orderkey-shifted shards of the sf1x lineitem AND orders (join structure
preserved exactly: every shard contributes the same per-order rows);
``o_custkey`` stays unshifted so the sf1x customer table serves all
shards (more orders per customer — q18's aggregate just grows), and the
unscaled dims (part/supplier/nation) serve every shard's FKs as in
baseline_scale10.py.

Usage: ``python tools/probe_q9q18_100x.py [--rebuild]`` → markdown rows
+ one JSON line, recorded in BASELINE.md.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
HERE = "/root/repo"
SF1X = os.path.join(HERE, ".tdcache", "sf1x")
OUT = os.path.join(HERE, ".tdcache", "sf10x_rel")
COPIES = 10
OFFSET = 100_000_000
QUERIES = ("q9_product_profit", "q18_large_volume_customers")


def build(rebuild: bool = False) -> str:
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    marker = os.path.join(OUT, "_BUILT")
    if os.path.exists(marker) and not rebuild:
        return OUT
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    for name, keys in (("lineitem", ["l_orderkey"]),
                       ("orders", ["o_orderkey"])):
        src = pq.read_table(os.path.join(SF1X, f"{name}.parquet"))
        writer = None
        path = os.path.join(OUT, f"{name}.parquet")
        for i in range(COPIES):
            t = src
            for k in keys:
                t = t.set_column(t.schema.get_field_index(k), k,
                                 pc.add(t.column(k), i * OFFSET))
            if writer is None:
                writer = pq.ParquetWriter(path, t.schema,
                                          write_statistics=True)
            writer.write_table(t, row_group_size=512 * 1024)
        writer.close()
        print(f"# built {name}", file=sys.stderr)
    for name in ("customer", "part", "supplier", "nation", "region"):
        os.symlink(os.path.join(SF1X, f"{name}.parquet"),
                   os.path.join(OUT, f"{name}.parquet"))
    open(marker, "w").close()
    return OUT


OUT2 = os.path.join(HERE, ".tdcache", "sf100x_rel")
OFFSET2 = 10_000_000_000


def build_next(rebuild: bool = False) -> str:
    """Third decade: 600M-row lineitem / 150M-row orders — 10
    orderkey-shifted shards of sf10x_rel (keys clear 10^10 apart)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    build()
    marker = os.path.join(OUT2, "_BUILT")
    if os.path.exists(marker) and not rebuild:
        return OUT2
    shutil.rmtree(OUT2, ignore_errors=True)
    os.makedirs(OUT2, exist_ok=True)
    for name, keys in (("lineitem", ["l_orderkey"]),
                       ("orders", ["o_orderkey"])):
        pf = pq.ParquetFile(os.path.join(OUT, f"{name}.parquet"))
        writer = None
        path = os.path.join(OUT2, f"{name}.parquet")
        for i in range(COPIES):
            for batch in pf.iter_batches(batch_size=2_000_000):
                import pyarrow as pa

                t = pa.Table.from_batches([batch])
                for k in keys:
                    t = t.set_column(t.schema.get_field_index(k), k,
                                     pc.add(t.column(k), i * OFFSET2))
                if writer is None:
                    writer = pq.ParquetWriter(path, t.schema)
                writer.write_table(t, row_group_size=1024 * 1024)
        writer.close()
        print(f"# built {name} (x100)", file=sys.stderr)
    for name in ("customer", "part", "supplier", "nation", "region"):
        os.symlink(os.path.join(SF1X, f"{name}.parquet"),
                   os.path.join(OUT2, f"{name}.parquet"))
    open(marker, "w").close()
    return OUT2


def main() -> None:
    import duckdb

    from clickhouse_datafusion_spark.queries import QUERIES as REG
    from clickhouse_datafusion_spark.session import get_spark

    rebuild = "--rebuild" in sys.argv
    d = build_next(rebuild) if "--next" in sys.argv else build(rebuild)
    res: dict[str, float] = {}
    spark = get_spark(app_name="probe_q9q18_100x")
    for name in QUERIES:
        fn = REG[name].spark_fn
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, d).toPandas()
            best = min(best, time.perf_counter() - t0)
        res[f"spark/{name}"] = round(best, 2)
        print(f"# spark {name}: {best:.2f}s", file=sys.stderr)
    con = duckdb.connect()
    con.execute(f"SET threads={os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in ("lineitem", "orders", "customer", "part", "supplier",
              "nation", "region"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d}/{t}.parquet')")
    for name in QUERIES:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(REG[name].oracle).df()
            best = min(best, time.perf_counter() - t0)
        res[f"duckdb/{name}"] = round(best, 2)
        print(f"# duckdb {name}: {best:.2f}s", file=sys.stderr)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
