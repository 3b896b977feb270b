"""Multimodal column handling: images/audio/video as opaque ``binary``
columns with typed metadata structs.

The Spark-side plumbing (schemas, Arrow-batched mapInPandas operators, batch
shapes, partition sizing) is real and tested; the codec kernels themselves
(image decode, resampling, frame extraction) are STUBBED because the codec
libraries are not in this container — each stub either raises
``NotImplementedError`` (strict mode) or produces a deterministic fake
(plumbing-test mode).

Scale notes: binary payloads ride the columnar path (parquet binary +
Arrow); mapInPandas streams batches so peak memory is
``spark.sql.execution.arrow.maxRecordsPerBatch`` × mean payload, and the ops
are shuffle-free projections. Keep payload columns OUT of shuffle keys; at
100 TB, store payloads in their own parquet column-chunks (they compress and
prune independently) and carry (uri, offset) pointers when payloads exceed
~1 MB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("kind", T.StringType(), False),     # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]), True),
])

FEATURE_DIM = 16


def documents_as_media(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Adapter: treat document bytes as a media payload (the container has no
    image/audio fixtures; payload bytes are real, kind is synthetic)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image").alias("kind"),
            F.lit("application/octet-stream").alias("mime"),
            (F.length(text_col) % 640).cast("int").alias("width"),
            (F.length(text_col) % 480).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"))


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for an image/audio decoder: a tiny feature
    vector derived from payload bytes. Replace with a real codec off-container."""
    if payload is None:
        return [0.0] * FEATURE_DIM
    acc = [0] * FEATURE_DIM
    for i, b in enumerate(payload):
        acc[i % FEATURE_DIM] = (acc[i % FEATURE_DIM] * 31 + b) % 1_000_003
    return [v / 1_000_003.0 for v in acc]


def decode_features(df: DataFrame, strict: bool = False) -> DataFrame:
    """Arrow-batched decode → fixed-dim feature vector per media row.

    ``strict=True`` raises NotImplementedError (no codecs in this
    container) — the production integration point.
    """
    out_schema = T.StructType(
        list(MEDIA_SCHEMA.fields)
        + [T.StructField("features", T.ArrayType(T.DoubleType()), True)])

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "media codecs unavailable in this container; "
                "install a decoder and replace _fake_decode")
        for pdf in batches:
            pdf = pdf.copy()
            pdf["features"] = pdf["payload"].map(_fake_decode)
            yield pdf

    return df.mapInPandas(op, schema=out_schema)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: validates metadata, updates dims, passes payload
    through (kernel stubbed)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.col("meta.kind").alias("kind"),
            F.col("meta.mime").alias("mime"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.col("meta.duration_ms").alias("duration_ms")))


def frame_sample_stub(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled timestamp
    (frame payload stubbed as NULL; timestamps real)."""
    n_frames = F.greatest(
        F.coalesce((F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1)),
        F.lit(1))
    return (df.select(
        "media_id", "meta",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"))
        .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
        .withColumn("frame_payload", F.lit(None).cast("binary")))
