"""Stage-cut helper: materialize a multi-consumer intermediate once.

Several operators (cross-doc span dedup's gram stream, the bigram-LM
count tables) have a node with two-plus downstream consumers; without a
cut Spark recomputes the whole upstream pipeline per consumer. The
default cut is ``localCheckpoint`` — cheapest (executor-local blocks,
no lineage replay) and right for the single-JVM bench/test topology.

CAVEAT (r12, advice): ``localCheckpoint`` truncates lineage with
NON-REPLICATED executor-local blocks. On a real cluster with dynamic
allocation / preemption / OOM-kills, losing any executor after the cut
fails the job unrecoverably — exactly the environment a 100 TB run
lives in. For those deployments set

    spark.conf.set("spark.clickhouse_datafusion_spark.stageCut",
                   "diskPersist")

and the same call sites persist with ``StorageLevel.DISK_ONLY``
instead: lineage is KEPT, so a lost block is recomputed from source
rather than failing the job, at the cost of keeping the blocks in the
storage layer until the session (or an explicit unpersist) releases
them. ``reliableCheckpoint`` writes to ``spark.checkpoint.dir``
(replicated, survives executor loss, survives lineage truncation) when
a checkpoint dir is configured — the strongest option for very long
lineages on lossy clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

CONF_KEY = "spark.clickhouse_datafusion_spark.stageCut"
_MODES = ("localCheckpoint", "diskPersist", "reliableCheckpoint",
          "parquetSpool")


def stage_cut(df: DataFrame, eager: bool = False) -> DataFrame:
    """Cut the plan at ``df`` so multiple consumers share one
    materialization. Mode per the ``spark.clickhouse_datafusion_spark.
    stageCut`` session conf (default ``localCheckpoint``; see module
    docstring for the executor-loss tradeoff).

    ``parquetSpool`` (r14) writes the intermediate to a session-scoped
    parquet directory and hands consumers a plain scan of it — the
    "recompute with cheaper lineage" strategy: unlike
    persist/localCheckpoint blocks, the spool is COLUMN-COMPRESSED
    (an (id, gpos, gh) gram stream compresses several-fold, shrinking
    the working set that competes with shuffle memory in one JVM) and
    its lineage is a parquet scan, so a lost executor re-reads instead
    of failing the job (localCheckpoint) or replaying the full
    upstream pipeline (persist). Costs one write job up front. Spool
    dirs live under ``spark.clickhouse_datafusion_spark
    .stageCut.spoolDir`` (default: a per-session dir under the
    system temp root, removed on session stop via a JVM shutdown
    hook only insofar as the OS cleans the temp root — long-lived
    services should point spoolDir at scratch space)."""
    mode = df.sparkSession.conf.get(CONF_KEY, "localCheckpoint")
    if mode not in _MODES:
        raise ValueError(f"{CONF_KEY}={mode!r}: expected one of {_MODES}")
    if mode == "diskPersist":
        from pyspark import StorageLevel

        out = df.persist(StorageLevel.DISK_ONLY)
        if eager:
            out.count()
        return out
    if mode == "reliableCheckpoint":
        return df.checkpoint(eager=eager)
    if mode == "parquetSpool":
        return _parquet_spool(df)
    return df.localCheckpoint(eager=eager)


def _parquet_spool(df: DataFrame) -> DataFrame:
    """Write ``df`` to a fresh spool subdir and return a scan of it.
    Always eager (the write job materializes the cut)."""
    import os
    import tempfile
    import uuid

    spark = df.sparkSession
    root = spark.conf.get(CONF_KEY + ".spoolDir", "")
    if not root:
        root = os.path.join(tempfile.gettempdir(),
                            f"stagecut_{spark.sparkContext.applicationId}")
    path = os.path.join(root, uuid.uuid4().hex)
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
