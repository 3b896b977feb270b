"""Dataset profiling: per-column statistics for pipeline monitoring.

Every corpus refresh should ship with a profile — null creep, cardinality
collapse, and range drift are the three cheapest early signals of an
upstream bug (a crawler emitting empty bodies, a join key suddenly
constant, timestamps from 1970). This is the engine-side analog of
DataFusion/ClickHouse ``ANALYZE``-style column statistics, surfaced as a
DataFrame so it can be diffed, stored, and alerted on like any other
table.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def column_profile(df: DataFrame, cols: list[str] | None = None,
                   exact_distinct: bool = True) -> DataFrame:
    """One row per column: (column, n_rows, n_nonnull, n_distinct, min_s,
    max_s) with min/max rendered as strings (computed in the column's own
    type, THEN cast — so numeric columns order numerically).

    Scale shape: ONE pass over the data. With ``exact_distinct`` the
    multi-column distincts make Spark expand the input (one duplicated
    stream per column) — exact, and what the oracle checks, but at 100 TB
    flip to ``exact_distinct=False`` for HyperLogLog
    ``approx_count_distinct`` (1-2% error, no expand). The long-format
    pivot happens on the single aggregated row, driver-weight zero.
    """
    cols = cols or df.columns
    nd = (F.countDistinct if exact_distinct
          else lambda c: F.approx_count_distinct(c))
    agg = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[a for c in cols for a in (
            F.count(F.col(c)).alias(f"__nn_{c}"),
            nd(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        )])
    profiles = [
        agg.select(
            F.lit(c).alias("column"),
            F.col("__n").cast("bigint").alias("n_rows"),
            F.col(f"__nn_{c}").cast("bigint").alias("n_nonnull"),
            F.col(f"__nd_{c}").cast("bigint").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_s"),
            F.col(f"__max_{c}").alias("max_s"))
        for c in cols]
    return reduce(DataFrame.unionAll, profiles)


def group_quantiles(df: DataFrame, value_col: str, group_col: str,
                    qs_permille: tuple[int, ...] = (500, 900, 990)
                    ) -> DataFrame:
    """EXACT per-group quantiles — p50/p90/p99 document length per source
    is the drift monitor every corpus refresh should diff (a p99 jump in
    one domain is a crawler loop; a p50 collapse is a parser bug).
    Returns (group, q_permille, value) with the LOWER-quantile
    definition: the smallest value whose cumulative count reaches
    ``q‰`` of the group — rank comparisons in exact integers
    (``cum·1000 ≥ q·total``), no interpolation, so any engine agrees.

    Scale shape: same histogram trick as ``percentile_filter``, but
    grouped — integer-valued (or pre-quantized) metrics have tiny
    per-group histograms, so ONE (group,value)-keyed aggregate shuffles
    O(groups·distinct_values) counter rows, the cumulative window runs
    over those aggregate rows (never data), and the quantile pick is a
    ≤|qs| -per-group reduce. No global sort, no sketch; quantize
    continuous scores first, exactly as percentile_filter documents.
    """
    g, v = F.col(group_col), F.col(value_col)
    hist = df.groupBy(g.alias("_g"), v.alias("_v")) \
        .agg(F.count("*").alias("_c"))
    w_cum = (W.partitionBy("_g").orderBy("_v")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    w_tot = W.partitionBy("_g")
    cum = hist.select(
        "_g", "_v",
        F.sum("_c").over(w_cum).alias("_cm"),
        F.sum("_c").over(w_tot).alias("_tot"))
    qlit = F.explode(F.array(*[F.lit(int(p)) for p in qs_permille]))
    return (cum.withColumn("q_permille", qlit)
            .filter(F.col("_cm") * 1000 >= F.col("q_permille") * F.col("_tot"))
            .groupBy("_g", "q_permille")
            .agg(F.min("_v").alias("value"))
            .select(F.col("_g").alias(group_col), "q_permille", "value"))


def key_skew(df: DataFrame, key_col: str, top_k: int = 10) -> DataFrame:
    """Join/shuffle-key skew report: the ``top_k`` hottest keys with
    their row counts and each key's share of the table in exact permille
    — the measurement that decides between a plain shuffle join, a
    broadcast, and salting (``skew.salted_join``). Run it BEFORE the
    10-hour job, not after the one straggler task finishes: a key
    holding >50‰ of a 10¹² -row table means one reducer gets 5×10¹⁰
    rows no matter how many executors you buy.

    Returns (key rendered as string, n, share_permille, rank) ordered
    hottest-first. One key-keyed aggregate + a top-k over the aggregate
    rows (TakeOrdered-sized, not data-sized) + a broadcast 1-row total —
    cost is the aggregate pass you were about to pay in the join anyway.
    AQE's skew-join handles moderate skew at runtime; this surfaces the
    pathological keys that need upstream redesign (null-key filters,
    salting, or a dedicated hot-key path).
    """
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")) \
        .agg(F.count("*").cast("bigint").alias("n"))
    total = counts.agg(F.sum("n").cast("bigint").alias("_tot"))
    top = counts.orderBy(F.col("n").desc(), "key").limit(int(top_k))
    w = W.orderBy(F.col("n").desc(), "key")
    return (top.crossJoin(F.broadcast(total))
            .select("key", "n",
                    F.expr("(n * 1000) DIV _tot").alias("share_permille"))
            .withColumn("rank", F.row_number().over(w).cast("bigint")))


def outlier_flags(df: DataFrame, value_col: str,
                  k_sigma: int = 3) -> DataFrame:
    """Flag rows whose integer ``value_col`` sits more than ``k_sigma``
    population standard deviations from the mean — the numeric twin of
    the quality filters: catch truncated documents, runaway boilerplate,
    and unit-mixup metadata before they skew training statistics.

    EXACT, no floats anywhere: ``|x − μ| > kσ`` is squared and cleared of
    denominators to ``(n·x − Σx)² > k²·(n·Σx² − (Σx)²)``, every term an
    integer. The comparison runs in ``DECIMAL(38,0)`` (Spark's widest
    exact type, matching DuckDB's HUGEINT) so it is overflow-safe to
    ~10¹⁵ rows of 10⁴-magnitude values; beyond that shard the corpus and
    combine moments (Σ, Σx², n are associative), or accept double
    precision for the flag and keep the decimal gate for audits.

    Scale shape: one scalar aggregate (3 integers) broadcast back onto a
    shuffle-free projection — the same two-job shape as
    ``percentile_filter`` but with O(1) state instead of a histogram.
    """
    x = F.col(value_col).cast("decimal(38,0)")
    mom = df.agg(F.count(value_col).cast("decimal(38,0)").alias("_n"),
                 F.sum(x).alias("_s"),
                 F.sum(x * x).alias("_s2"))
    lhs = (F.col("_n") * x - F.col("_s"))
    rhs = (F.col("_n") * F.col("_s2") - F.col("_s") * F.col("_s"))
    return (df.crossJoin(F.broadcast(mom))
            .withColumn("is_outlier",
                        (lhs * lhs) > (F.lit(int(k_sigma) ** 2) * rhs))
            .drop("_n", "_s", "_s2"))
