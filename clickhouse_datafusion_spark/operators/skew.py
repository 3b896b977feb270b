"""Skew mitigation — salting for hot keys.

AQE's skew-join handling (enabled in session.py) covers sort-merge joins at
runtime; salting is the explicit tool for (a) skewed *aggregations* (AQE
does not split a hot groupBy key) and (b) broadcast-infeasible skewed joins.

- ``salted_aggregate``: two-stage aggregation — stage 1 groups by
  (key, salt) spreading a hot key over ``n_salts`` reducers, stage 2 merges
  partials. Works for any algebraic aggregate given its (partial, merge)
  pair; helpers provided for count/sum.
- ``salted_join``: replicate the *small-ish* build side ``n_salts`` times
  (one copy per salt) and salt the probe side randomly-but-deterministically
  (hash of a row id), so one hot key's rows fan out over ``n_salts`` tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, n_salts: int, seed_cols: list[str]) -> Column:
    """Deterministic pseudo-random salt derived from row content (no
    rand(): reproducible plans, stable tests)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in seed_cols]), F.lit(n_salts))


def salted_aggregate(df: DataFrame, key: str,
                     aggs: dict[str, tuple], n_salts: int = 8,
                     salt_seed_cols: list[str] | None = None) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output column name → (src_col, partial_fn, merge_fn)::

        salted_aggregate(df, "k", {
            "n":     ("*",   F.count, F.sum),   # count, then sum of counts
            "total": ("val", F.sum,   F.sum),
            "mx":    ("val", F.max,   F.max),
        })
    """
    seed = salt_seed_cols or [c for c in df.columns if c != key][:1] or [key]
    salted = df.withColumn("_salt", _salt_col(df, n_salts, seed))
    partial = (salted.groupBy(key, "_salt")
               .agg(*[p(src).alias(f"_p_{name}")
                      for name, (src, p, _m) in aggs.items()]))
    return (partial.groupBy(key)
            .agg(*[m(f"_p_{name}").alias(name)
                   for name, (_src, _p, m) in aggs.items()]))


def salted_count_sum(df: DataFrame, key: str, sum_col: str,
                     n_salts: int = 8) -> DataFrame:
    """Skew-safe ``groupBy(key).agg(count(*), sum(sum_col))``."""
    salted = df.withColumn(
        "_salt", _salt_col(df, n_salts, [sum_col]))
    partial = (salted.groupBy(key, "_salt")
               .agg(F.count("*").alias("_n"), F.sum(sum_col).alias("_s")))
    return (partial.groupBy(key)
            .agg(F.sum("_n").alias("n"), F.sum("_s").alias("total")))


def salted_join(probe: DataFrame, build: DataFrame, key: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Skew-safe equi-join: build side replicated per salt, probe side
    salted by row hash. Output equals ``probe.join(build, key, how)``.

    Use when the hot-key side is too big for one task and the other side is
    replicable (n_salts × |build| rows). For broadcast-sized build sides
    prefer ``F.broadcast``; for AQE-splittable SMJs prefer AQE.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            "salted_join supports inner/left only: the build side is "
            "replicated per salt, so right/full-outer would duplicate "
            "unmatched build rows")
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    build_rep = build.select("*", salts)
    probe_cols = [c for c in probe.columns if c != key]
    probe_salted = probe.withColumn(
        "_salt", _salt_col(probe, n_salts, probe_cols[:1] or [key]))
    out = probe_salted.join(build_rep, [key, "_salt"], how)
    return out.drop("_salt")
