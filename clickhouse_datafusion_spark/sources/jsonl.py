"""JSONL (newline-delimited JSON) source/sink helpers.

JSONL is the de-facto interchange format for LLM training corpora
(one document object per line, gzip-friendly, streamable). Spark's JSON
reader handles it natively; these helpers pin the two decisions that
matter at scale:

- **Always pass an explicit schema.** Without one Spark runs a full
  inference scan — a second pass over 100 TB — and infers unstable types
  across corpus shards. With a schema the read is single-pass and
  columns project/push down like any other source.
- **Compressed JSONL (.jsonl.gz) is NOT splittable** — one gzip member =
  one task, so shard the files at write time (`n_files`) to set the read
  parallelism. Parquet remains the engine-native format; JSONL is the
  ingest/egress boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DOCUMENTS_JSONL_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("n_chars", T.LongType(), True),
])


def read_jsonl(spark: SparkSession, path: str,
               schema: T.StructType) -> DataFrame:
    """Schema-pinned JSONL read (PERMISSIVE mode: malformed lines yield
    null columns rather than failing the shard — surface them via
    profile.column_profile null counts, don't crash a 100 TB job)."""
    return spark.read.schema(schema).json(path)


def write_jsonl(df: DataFrame, path: str, n_files: int | None = None,
                compression: str | None = None,
                mode: str = "overwrite") -> None:
    """JSONL write; ``n_files`` controls shard count (and therefore the
    read parallelism of any non-splittable compressed output)."""
    out = df.repartition(n_files) if n_files else df
    w = out.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
