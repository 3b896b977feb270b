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

from pyspark.sql import DataFrame
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
