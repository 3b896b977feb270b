"""Structured Streaming over the events table: the five streaming operator
classes (beyond-reference — the reference engine is bounded-only).

Replays the events parquet through a file source into memory sinks; the
identical transformations target Kafka or any other streaming source
unchanged.
"""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from _common import SF_DIR, engine
from clickhouse_datafusion_spark.streaming import (
    dedup_stream,
    read_events_stream,
    run_to_memory_sink,
    session_windows,
    stream_static_enrich,
    stream_stream_interval_join,
    tumbling_counts,
)

eng = engine()
spark = eng.spark
spark.conf.set("spark.sql.session.timeZone", "UTC")

d = tempfile.mkdtemp()
shutil.copy(os.path.join(SF_DIR, "events.parquet"),
            os.path.join(d, "events.parquet"))

print("== 1. watermarked tumbling-window counts ==")
run_to_memory_sink(tumbling_counts(read_events_stream(spark, d)),
                   "ex_tumbling").show(5)

print("== 2. watermark-bounded streaming dedup ==")
out = run_to_memory_sink(dedup_stream(read_events_stream(spark, d)),
                         "ex_dedup")
print("distinct events:", out.count())

print("== 3. gap-merged session windows ==")
run_to_memory_sink(session_windows(read_events_stream(spark, d)),
                   "ex_sessions").show(5)

print("== 4. stream-static enrichment join ==")
cust = spark.read.parquet(os.path.join(SF_DIR, "customer.parquet"))
n = cust.count()
enriched = stream_static_enrich(
    read_events_stream(spark, d),
    cust.select("c_custkey", F.col("c_mktsegment").alias("segment")),
    F.col("user_id") % n + 1, "c_custkey")
run_to_memory_sink(enriched, "ex_enrich") \
    .select("event_id", "user_id", "segment").show(5)

print("== 5. stream-stream interval join (view -> click attribution) ==")
views = read_events_stream(spark, d).filter(F.col("event_type") == "view")
clicks = read_events_stream(spark, d).filter(F.col("event_type") == "click")
run_to_memory_sink(
    stream_stream_interval_join(views, clicks, how="left_outer"),
    "ex_ssjoin").select("l_event_id", "r_event_id", "l_user_id").show(5)
