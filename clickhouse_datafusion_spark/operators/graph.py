"""Iterative graph operators over edge DataFrames.

PageRank is the canonical driver-coordinated iterative algorithm on Spark
(the same loop shape as ``dedup.connected_components``): each iteration is
two narrow-keyed operations — a src-keyed join of ranks onto edges and a
dst-keyed aggregate of contributions — shuffling only (node, rank) pairs,
never payloads. ``localCheckpoint`` truncates lineage so the plan stays
flat across iterations. At 100 TB (web-graph scale) the per-iteration cost
is two shuffles of 16-byte rows; the edge relation is checkpointed once and
re-read co-partitioned.

Arithmetic is exact-integer (micro-units with floor division) so a fixed
iteration count is bit-reproducible across engines — the correctness gate
unrolls the same iterations as SQL CTEs in DuckDB. Real-valued PageRank
differs only by the quantization (≤1e-6 per edge per step).

Use case in a training-data pipeline: domain/source authority scores for
quality weighting (crawl-graph PageRank is a standard quality prior, cf.
Common Crawl harmonic-centrality ranking).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             n_iter: int = 3, damping_pct: int = 85,
             scale: int = 1_000_000) -> DataFrame:
    """(node, rank_micro) after ``n_iter`` exact-integer PageRank steps.

    r₀ = scale // N for every node;
    rₜ₊₁(v) = (scale·(100−d)) // (100·N)
              + Σ_{u→v} (d·rₜ(u)) // (100·outdeg(u))

    with d = ``damping_pct`` and all divisions floor — deterministic in
    any engine. Dangling nodes (no out-edges) simply leak their mass, the
    standard simplification when ranks are used as a relative quality
    prior rather than a probability distribution.

    N and the base constant are driver-side scalars (one tiny count) —
    everything else is distributed: per iteration ONE src-keyed join and
    ONE dst-keyed aggregate over (node, bigint) pairs.
    """
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0, 100), got {damping_pct}")
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .distinct().localCheckpoint(eager=True))
    nodes = (e.select(F.col("src").alias("v"))
             .union(e.select(F.col("dst").alias("v")))
             .distinct().localCheckpoint(eager=True))
    n = nodes.count()
    base = (scale * (100 - damping_pct)) // (100 * n)
    od = e.groupBy("src").agg(F.count("*").alias("od"))
    eo = e.join(od, "src").localCheckpoint(eager=True)
    r = nodes.select(
        "v", F.lit(scale // n).cast("bigint").alias("r"))
    for _ in range(n_iter):
        contrib = (eo.join(r, eo["src"] == r["v"])
                   .select(eo["dst"].alias("v"),
                           F.expr(f"({damping_pct} * r) DIV (100 * od)")
                           .alias("c")))
        agg = contrib.groupBy("v").agg(F.sum("c").alias("s"))
        r = (nodes.join(agg, "v", "left")
             .select("v", (F.lit(base) + F.coalesce("s", F.lit(0)))
                     .cast("bigint").alias("r"))
             .localCheckpoint(eager=True))
    return r.select(F.col("v").alias("node"),
                    F.col("r").alias("rank_micro"))
