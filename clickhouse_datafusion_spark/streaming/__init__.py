"""Structured Streaming extensions over event streams.

The reference is bounded-only (Boundedness::Bounded, reference
src/sql.rs:308) — streaming is a beyond-parity extension (SURVEY §2.10, §7):
watermarked tumbling/sliding/session windows and custom stateful operators
over the ``events`` fixture shape.
"""

from clickhouse_datafusion_spark.sources.clickhouse_tail import (
    reset_tail_progress,
    tail_lag,
)
from clickhouse_datafusion_spark.streaming.events import (
    dedup_against_corpus,
    dedup_content_stream,
    dedup_stream,
    drain_tail_until_stable,
    read_events_stream,
    tumbling_counts,
    sliding_value_sums,
    session_windows,
    stream_static_enrich,
    stream_stream_interval_join,
    stream_to_remote_table,
    stream_upsert_snapshot,
    tail_remote_table,
    streaming_retention,
    stream_append_ann_index,
    run_to_memory_sink,
)

__all__ = [
    "dedup_against_corpus",
    "dedup_content_stream",
    "dedup_stream",
    "read_events_stream",
    "tumbling_counts",
    "sliding_value_sums",
    "session_windows",
    "stream_static_enrich",
    "stream_stream_interval_join",
    "stream_to_remote_table",
    "stream_upsert_snapshot",
    "tail_remote_table",
    "streaming_retention",
    "stream_append_ann_index",
    "run_to_memory_sink",
    "drain_tail_until_stable",
    "reset_tail_progress",
    "tail_lag",
]
