#!/usr/bin/env python
"""Streaming-path measurement (r8 verdict task 5): per-micro-batch
latency, input rate, and STATE-STORE size for the three stateful
streaming operator classes — st2 (watermarked exact dedup), st7
(dedup against a persistent corpus), st9 (CDC upsert into the
snapshot store) — at a 10×-events replay (1M events / 10 batches).

Corpus: 10 shard files of sf0.1's events (100k rows / 30 days each);
shard i shifts event_id by i·10M (so cross-shard rows are NOT
duplicates — dedup state is honestly per-key) and ts by i·31 days (so
event time ADVANCES across batches and the watermark can evict).
File mtimes are staged in shard order because the file source
processes by (modTime, path). An 11th shard replays shard 9 verbatim
(ids unshifted) to show the dedup actually dropping at scale.

Metrics come from StreamingQueryProgress — the same numbers a
production monitor reads: triggerExecution ms, numInputRows,
stateOperators[].numRowsTotal / memoryUsedBytes. The eviction-bound
CLAIM (state rows track the watermark horizon, not the corpus) is
asserted in tests/test_streaming.py::test_dedup_state_evicts_behind_watermark;
this probe records the at-scale numbers for BASELINE.md.

Usage: python tools/probe_streaming.py
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/root/repo/.tdcache/stream_probe"
COPIES = 10
ID_OFFSET = 10_000_000
TS_SHIFT_DAYS = 31


def stage() -> str:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    d = os.path.join(OUT, "replay")
    marker = os.path.join(d, "_BUILT")
    if os.path.exists(marker):
        return d
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    src = pq.read_table(os.path.join(SRC, "events.parquet"))
    paths = []
    for i in range(COPIES):
        cols = {}
        for cn in src.column_names:
            col = src[cn]
            if cn == "event_id" and i > 0:
                col = pc.cast(pc.add(col, i * ID_OFFSET),
                              src.schema.field(cn).type)
            if cn == "ts" and i > 0:
                col = pc.cast(
                    pc.add(pc.cast(col, pa.int64()),
                           i * TS_SHIFT_DAYS * 86_400_000_000),
                    src.schema.field(cn).type)
            cols[cn] = col
        p = os.path.join(d, f"shard_{i:02d}.parquet")
        pq.write_table(pa.table(cols, schema=src.schema), p)
        paths.append(p)
    # shard 10 = shard 9 verbatim (same ids, same ts): a full duplicate
    # batch the dedup must drop inside the watermark horizon
    dup = os.path.join(d, f"shard_{COPIES:02d}_dup.parquet")
    shutil.copy(paths[-1], dup)
    paths.append(dup)
    now = time.time()
    for k, p in enumerate(paths):       # file source orders by (modTime, path)
        os.utime(p, (now + k, now + k))
    with open(marker, "w") as fh:
        fh.write("ok")
    return d


def drain(q) -> list[dict]:
    q.processAllAvailable()
    prog = [json.loads(p.json) if isinstance(p.json, str) else p.json
            for p in q.recentProgress]
    q.stop()
    return [p for p in prog if p.get("numInputRows", 0) > 0]


def report(tag: str, prog: list[dict]) -> dict:
    lat = [p["durationMs"]["triggerExecution"] for p in prog]
    rows = [p["numInputRows"] for p in prog]
    state_rows = [p["stateOperators"][0]["numRowsTotal"]
                  for p in prog if p.get("stateOperators")]
    state_mem = [p["stateOperators"][0]["memoryUsedBytes"]
                 for p in prog if p.get("stateOperators")]
    out = {
        "batches": len(prog),
        "rows_total": sum(rows),
        "batch_ms_median": sorted(lat)[len(lat) // 2],
        "batch_ms_max": max(lat),
        "rows_per_sec": round(sum(rows) / (sum(lat) / 1000.0)),
        "state_rows_max": max(state_rows) if state_rows else None,
        "state_rows_last": state_rows[-1] if state_rows else None,
        "state_mb_max": round(max(state_mem) / 2**20, 1) if state_mem else None,
    }
    print(f"{tag}: {json.dumps(out)}", flush=True)
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from clickhouse_datafusion_spark.session import get_spark
    from clickhouse_datafusion_spark.streaming import (
        dedup_against_corpus, dedup_stream, read_events_stream,
        stream_upsert_snapshot)

    d = stage()
    spark = get_spark(app_name="probe_streaming")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    results = {}

    # st2: watermarked exact dedup (dropDuplicatesWithinWatermark)
    s = dedup_stream(read_events_stream(spark, d), watermark="2 hours")
    q = (s.writeStream.outputMode("append").format("memory")
         .queryName("probe_st2").start())
    prog = drain(q)
    results["st2_dedup_stream"] = report("st2_dedup_stream", prog)
    out_n = spark.sql("SELECT count(*) FROM probe_st2").first()[0]
    in_n = sum(p["numInputRows"] for p in prog)
    print(f"st2 output={out_n} input={in_n} "
          f"(dup shard dropped: {in_n - out_n})", flush=True)

    # st7: dedup against a persistent corpus (anti join + watermark
    # dedup). The hash must include event_id: the staged shards shift
    # ids/ts but carry identical content columns, so a content-only hash
    # would put EVERY row in the seen-set and measure nothing (first
    # probe run did exactly that). With event_id in the key, the corpus
    # drop hits shard 0 only and the watermark dedup drops the dup shard.
    ev0 = spark.read.parquet(os.path.join(d, "shard_00.parquet"))
    cols = ["event_id", "event_type", "value", "props"]
    seen = (ev0.select(F.md5(F.concat_ws("\x1f", *cols)).alias("h"))
            .distinct().localCheckpoint(eager=True))
    s = dedup_against_corpus(read_events_stream(spark, d), seen,
                             hash_cols=cols, watermark="2 hours")
    q = (s.writeStream.outputMode("append").format("memory")
         .queryName("probe_st7").start())
    results["st7_corpus_dedup"] = report("st7_corpus_dedup", drain(q))
    out7 = spark.sql("SELECT count(*) FROM probe_st7").first()[0]
    print(f"st7 output={out7} (corpus-dropped shard 0, "
          f"watermark-dropped dup shard)", flush=True)

    # st9: CDC upsert into the snapshot store (foreachBatch merge).
    # stream_upsert_snapshot drives the query itself (processAllAvailable
    # inside), so the metric is whole-replay wall + snapshot key count.
    snap = os.path.join(OUT, "snap")
    shutil.rmtree(snap, ignore_errors=True)
    t0 = time.perf_counter()
    stream_upsert_snapshot(read_events_stream(spark, d), snap)
    wall = time.perf_counter() - t0
    from clickhouse_datafusion_spark.operators.layout import read_snapshot

    n_keys = read_snapshot(spark, snap).count()
    results["st9_upsert_snapshot"] = {
        "batches": COPIES + 1, "rows_total": 1_100_000,
        "wall_s": round(wall, 1),
        "rows_per_sec": round(1_100_000 / wall),
        "snapshot_keys": n_keys,
    }
    print(f"st9_upsert_snapshot: {json.dumps(results['st9_upsert_snapshot'])}",
          flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
