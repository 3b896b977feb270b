"""As-of and range joins — engine extensions (SURVEY §2.3 notes the
reference lacks them; they are table stakes for event/time-series analytics).

``asof_join`` uses the union + running-last window formulation rather than a
pairwise join: tag both sides, union, and carry the most recent right-side
row forward within each key. One shuffle on (key), no range-explosion, no
Python — this is the formulation that scales (a naive ``l.ts >= r.ts``
theta-join is quadratic per key; ``merge_asof`` in pandas is single-node).

``range_join`` is an equi-key + interval predicate join — Spark executes it
as a hash join on the key with a post-filter, which is the right plan when
keys are selective. For unkeyed interval joins, bucketize the range first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str, right_ts: str,
              direction: str = "backward",
              suffix: str = "_r") -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` (direction='backward'; 'forward' gives the
    earliest right row with ``right.ts >= left.ts``) within the same ``on``
    key. Left rows with no match keep nulls (left-outer as-of).

    Equal timestamps match (the right row sorts before the left probe).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    rcols = [c for c in right.columns if c != on]
    payload = F.struct(*[F.col(c) for c in rcols])
    r = right.select(
        F.col(on).alias("_k"), F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"), payload.alias("_rv"))
    l_ = left.select(
        F.col(on).alias("_k"), F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lv"))
    r = r.withColumn("_lv", F.lit(None).cast(l_.schema["_lv"].dataType))

    u = l_.unionByName(r.select("_k", "_ts", "_side", "_rv", "_lv"))
    if direction == "backward":
        w = (W.partitionBy("_k").orderBy(F.col("_ts").asc(), F.col("_side").asc())
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    else:
        w = (W.partitionBy("_k").orderBy(F.col("_ts").desc(), F.col("_side").asc())
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    matched = u.withColumn("_m", F.last("_rv", ignorenulls=True).over(w))

    out = matched.filter(F.col("_side") == 1)
    cols = [F.col(f"_lv.{c}").alias(c) for c in left.columns]
    cols += [F.col(f"_m.{c}").alias(c + (suffix if c in left.columns else ""))
             for c in rcols]
    return out.select(*cols)


def range_join(left: DataFrame, right: DataFrame, on: str,
               left_ts: str, right_ts: str,
               lower, upper, how: str = "inner") -> DataFrame:
    """Rows of ``right`` whose ``right_ts`` falls in
    ``[left_ts + lower, left_ts + upper]``, equi-keyed on ``on``.

    ``lower``/``upper`` are Column interval expressions
    (e.g. ``F.expr("INTERVAL 0 DAYS")``).
    """
    lk, rk = left.alias("l"), right.alias("r")
    cond = ((F.col(f"l.{on}") == F.col(f"r.{on}"))
            & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") + lower)
            & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + upper))
    return lk.join(rk, cond, how)


def locf_fill(df: DataFrame, value_cols: list[str], ts_col: str = "ts",
              key_cols: list[str] | tuple[str, ...] = ("user_id",),
              tiebreak_col: str | None = None,
              suffix: str = "_filled") -> DataFrame:
    """Last-observation-carried-forward gap fill: for each key's
    time-ordered event stream, replace NULLs in ``value_cols`` with the
    most recent non-null observation — the standard repair for sparse
    sensor/telemetry/feature streams before training-feature extraction
    (leading NULLs, with nothing to carry, stay NULL; downstream decides
    the cold-start default).

    One (key)-shuffled window per call covering ALL value columns —
    ``F.last(ignorenulls=True)`` over an unbounded-preceding frame is a
    running O(1)-state scan, not a per-row lookback, so cost is linear in
    rows regardless of gap length. Pass ``tiebreak_col`` (e.g. the event
    id) whenever timestamps can collide: an ambiguous order would make
    the filled value engine-dependent — the gate always pins it.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = (W.partitionBy(*[F.col(k) for k in key_cols]).orderBy(*order)
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    out = df
    for c in value_cols:
        out = out.withColumn(c + suffix,
                             F.last(F.col(c), ignorenulls=True).over(w))
    return out
