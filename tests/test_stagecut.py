"""stage_cut (r12 advice): the multi-consumer materialization helper's
mode knob. Default localCheckpoint is right for single-JVM; diskPersist
keeps lineage so executor loss is recoverable on lossy clusters."""

from __future__ import annotations

import pytest

from clickhouse_datafusion_spark.operators.stagecut import (
    CONF_KEY,
    stage_cut,
)


def test_default_is_local_checkpoint(spark):
    df = spark.range(100).toDF("k")
    out = stage_cut(df, eager=True)
    # lineage truncated: the plan root is the checkpointed RDD scan
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan
    assert out.count() == 100


def test_disk_persist_mode_keeps_lineage(spark):
    from pyspark import StorageLevel

    df = spark.range(100).toDF("k")
    spark.conf.set(CONF_KEY, "diskPersist")
    try:
        out = stage_cut(df, eager=True)
        assert out.storageLevel == StorageLevel.DISK_ONLY
        # lineage KEPT (recoverable): no checkpoint-RDD scan at the root
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "LogicalRDD" not in plan
        assert out.count() == 100
    finally:
        out.unpersist()
        spark.conf.unset(CONF_KEY)


def test_reliable_checkpoint_mode(spark, tmp_path):
    df = spark.range(50).toDF("k")
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    spark.conf.set(CONF_KEY, "reliableCheckpoint")
    try:
        out = stage_cut(df, eager=True)
        assert out.count() == 50
        # a replicated checkpoint landed in the configured dir
        assert any((tmp_path / "ckpt").rglob("*"))
    finally:
        spark.conf.unset(CONF_KEY)


def test_invalid_mode_raises(spark):
    spark.conf.set(CONF_KEY, "ramDoubler")
    try:
        with pytest.raises(ValueError, match="stageCut"):
            stage_cut(spark.range(1))
    finally:
        spark.conf.unset(CONF_KEY)


def test_d8_and_t11_identical_under_disk_persist(spark):
    """The two advice call sites (span dedup's gram stream, the bigram
    LM count tables) produce identical results in either mode — the
    knob changes fault tolerance, not semantics."""
    from clickhouse_datafusion_spark.operators.dedup import (
        drop_cross_doc_spans)
    from clickhouse_datafusion_spark.operators.text import bigram_lm_score

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again and again"),
         (2, "the quick brown fox jumps over the lazy dog again and again"),
         (3, "a completely different document body with unique words here"),
         (4, "short doc")],
        "doc_id bigint, body string")

    def run():
        spans = sorted(map(tuple, drop_cross_doc_spans(
            docs, ngram=5, text_col="body", id_col="doc_id").collect()))
        lm = sorted(map(tuple, bigram_lm_score(
            docs, text_col="body", id_col="doc_id",
            lm_df=docs).collect()))
        return spans, lm

    base = run()
    spark.conf.set(CONF_KEY, "diskPersist")
    try:
        assert run() == base
    finally:
        spark.conf.unset(CONF_KEY)


def test_parquet_spool_mode(spark, tmp_path):
    """r14: the parquetSpool cut writes the intermediate to a parquet
    spool and hands consumers a plain scan — column-compressed on
    disk, lineage = a re-readable file scan (the 'recompute with
    cheaper lineage' strategy from d8's 5M-doc storage A/B)."""
    spark.conf.set(CONF_KEY + ".spoolDir", str(tmp_path / "spool"))
    spark.conf.set(CONF_KEY, "parquetSpool")
    try:
        df = spark.range(100).toDF("k")
        out = stage_cut(df)
        # the cut materialized into the spool dir and re-reads from it
        assert any((tmp_path / "spool").rglob("*.parquet"))
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "Relation" in plan and "parquet" in plan
        assert out.count() == 100
        # value identity through a multi-consumer operator
        from clickhouse_datafusion_spark.operators.dedup import (
            drop_cross_doc_spans)

        docs = spark.createDataFrame(
            [(1, "one two three four five six seven"),
             (2, "one two three four five six seven"),
             (3, "a different body entirely here now")],
            "doc_id bigint, body string")
        got = sorted(map(tuple, drop_cross_doc_spans(
            docs, ngram=5, text_col="body", id_col="doc_id").collect()))
        spark.conf.unset(CONF_KEY)
        base = sorted(map(tuple, drop_cross_doc_spans(
            docs, ngram=5, text_col="body", id_col="doc_id").collect()))
        assert got == base
    finally:
        spark.conf.unset(CONF_KEY)
        spark.conf.unset(CONF_KEY + ".spoolDir")
