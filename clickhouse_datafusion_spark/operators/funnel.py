"""Event-sequence analytics: retention cohorts and window funnels —
Spark-native analogs of ClickHouse's ``retention()`` and
``windowFunnel()`` aggregates (reference function registry src/udfs/*
maps scalar CH functions; these parameterized aggregates are the
behavioral-analytics surface ClickHouse deployments actually lean on, so
an engine claiming drop-in utility needs them).

Both are exact and oracle-expressible: retention is a conditional
aggregate; the funnel is a chain of forward as-of joins (greedy
earliest-next matching, which is optimal for maximizing depth within a
window — delaying a step can only shrink the remaining window).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def retention(events: DataFrame, conds: list[Column],
              user_col: str = "user_id") -> DataFrame:
    """ClickHouse ``retention(cond1, cond2, ...)`` semantics per user:
    ``r1 = 1`` iff cond1 ever held; ``r_i = 1`` iff cond1 AND cond_i
    both held (every later flag is gated on the anchor condition — the
    "was acquired, came back in period i" cohort shape).

    Returns (user, r_1..r_n). Sum the columns for the cohort curve.
    One user-keyed aggregate — conditional ``max`` per condition with
    map-side combine; scale-wise identical to any groupBy.
    """
    aggs = [F.max(F.when(c, 1).otherwise(0)).alias(f"_c{i}")
            for i, c in enumerate(conds)]
    per_user = events.groupBy(F.col(user_col)).agg(*aggs)
    out = [F.col("_c0").alias("r_1")]
    out += [(F.col("_c0") * F.col(f"_c{i}")).alias(f"r_{i + 1}")
            for i in range(1, len(conds))]
    return per_user.select(user_col, *out)


def funnel_depths(events: DataFrame, steps: list[Column],
                  window, user_col: str = "user_id",
                  ts_col: str = "ts") -> DataFrame:
    """ClickHouse ``windowFunnel(window)(ts, step1, step2, ...)``
    analog: for each user, the deepest funnel level reached by any
    chain step1 → step2 → ... of strictly-later events all within
    ``window`` of the chain's step-1 event. Users with no step-1 event
    are absent (CH returns 0 — filter-join the user dim downstream if
    the zeros matter).

    Greedy matching: each step takes the EARLIEST qualifying event
    after the previous step — optimal, since postponing a step only
    shrinks the window left for the rest. Each step is one forward
    as-of join (union + running-first window — ``asof.asof_join``'s
    machinery, one user-keyed shuffle per step, no theta join), so a
    k-step funnel is k−1 as-of joins over the step subsets, not a
    k-way self-join of the event table. A same-timestamp event cannot
    serve the next step (strictly-later semantics, pinned via a
    1-microsecond probe shift so engines agree; same-timestamp
    candidates for one step carry identical match times, so no
    tiebreak is needed).

    ``window`` is a Column interval (e.g. ``F.expr("INTERVAL 7 DAYS")``).
    """
    from clickhouse_datafusion_spark.operators.asof import asof_join

    k = len(steps)
    chains = (events.filter(steps[0])
              .select(F.col(user_col), F.col(ts_col).alias("_t1")))
    depth = F.lit(1)
    prev_ts = "_t1"
    for i in range(1, k):
        nxt = (events.filter(steps[i])
               .select(F.col(user_col), F.col(ts_col).alias(f"_t{i + 1}")))
        # strictly-later probe: shift the left timestamp by 1 microsecond
        probe = chains.withColumn("_probe",
                                  F.col(prev_ts) + F.expr(
                                      "INTERVAL 1 MICROSECOND"))
        joined = asof_join(probe, nxt, on=user_col,
                           left_ts="_probe", right_ts=f"_t{i + 1}",
                           direction="forward").drop("_probe")
        # a dead chain (previous step missing/late → null prev) must stay
        # dead: a null probe through the as-of machinery is unspecified,
        # so gate the match on the previous step having matched, being a
        # real event, and landing inside the window of step 1
        chains = joined.withColumn(
            f"_t{i + 1}",
            F.when(F.col(prev_ts).isNotNull()
                   & F.col(f"_t{i + 1}").isNotNull()
                   & (F.col(f"_t{i + 1}") <= F.col("_t1") + window),
                   F.col(f"_t{i + 1}")))
        depth = depth + F.when(F.col(f"_t{i + 1}").isNotNull(),
                               1).otherwise(0)
        prev_ts = f"_t{i + 1}"
    per_chain = chains.withColumn("_depth", depth)
    return (per_chain.groupBy(F.col(user_col))
            .agg(F.max("_depth").cast("bigint").alias("depth")))
