"""Deterministic sampling / splitting operators for training-data pipelines.

Scale design:

- **hash_split**: split assignment is a pure projection on a content hash —
  no shuffle, no state, stable under re-runs, appends, and repartitioning
  (the properties random() splits lack on a cluster). At 100 TB this
  pipelines into the scan with zero data movement.
- **stratified_sample**: one window per stratum (shuffle keyed by the
  stratum column). Deterministic order inside the stratum comes from a hash
  of the id, so the sample is reproducible and unbiased w.r.t. insertion
  order. Stratum skew = window-partition skew; for heavy strata use
  hash_split-style Bernoulli sampling instead (`fraction` applied to the
  hash bucket), which needs no window at all.
- **bernoulli_stratified**: the no-shuffle variant — keeps each row iff its
  id-hash bucket falls under the stratum's fraction; exact-size guarantees
  are traded for a fully pipelined plan.
- **domain_cap / mixture_sample / seeded_shuffle**: one stratum-keyed window
  shuffle each (cap enforcement, permille-weighted mixture budgets, seeded
  training order); md5 ordering keeps every draw reproducible and
  layout-independent.
- **percentile_filter**: exact adaptive threshold via a tiny score
  histogram + broadcast cutoff — no global sort, no sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

_N_BUCKETS = 100


def hash_bucket(col, n_buckets: int = _N_BUCKETS):
    """Deterministic bucket in [0, n_buckets) from a 16-bit slice of
    md5(id). md5 (not xxhash64) so external systems — and the DuckDB
    oracle — can reproduce assignments byte-for-byte."""
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10)
            .cast("int") % n_buckets)


def hash_split(df: DataFrame, id_col: str = "doc_id",
               train: float = 0.8, val: float = 0.1,
               split_col: str = "split") -> DataFrame:
    """Append a deterministic train/val/test split column.

    Buckets md5(id) into percent bins: [0, train) → train,
    [train, train+val) → val, rest → test. Pure projection — rows never
    move, and the assignment is stable across runs and cluster layouts.
    """
    b = hash_bucket(F.col(id_col))
    t_hi, v_hi = int(train * _N_BUCKETS), int((train + val) * _N_BUCKETS)
    return df.withColumn(
        split_col,
        F.when(b < t_hi, F.lit("train"))
         .when(b < v_hi, F.lit("val"))
         .otherwise(F.lit("test")))


def stratified_sample(df: DataFrame, stratum_col: str, fraction: float,
                      id_col: str = "doc_id") -> DataFrame:
    """Exact-fraction deterministic sample per stratum: the ceil(n·f)
    rows with the smallest md5(id) in each stratum.

    One shuffle (window partitioned by the stratum). Deterministic: the
    hash order is a property of the ids, not of partitioning.
    """
    hk = F.md5(F.col(id_col).cast("string"))
    w = W.partitionBy(stratum_col).orderBy(hk, F.col(id_col))
    return (df.withColumn("_rn", F.row_number().over(w))
            .withColumn("_n", F.count("*").over(W.partitionBy(stratum_col)))
            .filter(F.col("_rn") <= F.ceil(F.col("_n") * F.lit(fraction)))
            .drop("_rn", "_n"))


def domain_cap(df: DataFrame, domain_col: str = "source", cap: int = 10,
               order_cols=None, blocklist: list[str] | None = None,
               id_col: str = "doc_id") -> DataFrame:
    """Per-domain document caps + blocklist — the anti-domination pass of a
    web-corpus pipeline (no single site should contribute unbounded mass to
    the training mix; spam/SEO domains are dropped outright).

    Keeps at most ``cap`` documents per domain, preferring ``order_cols``
    (default: longest first, id tiebreak — swap in a quality score column
    in production). ``blocklist`` rows are removed before ranking.

    Scale shape: the blocklist filter is a literal IN-list (codegen at the
    scan — a large blocklist would broadcast-anti-join instead), then ONE
    shuffle keyed by domain for the ranking window. Domain skew is real at
    web scale (a crawl can have 10⁹ pages of one host): since every domain
    keeps only ``cap`` rows, pre-aggregate relief is cheap — Bernoulli
    pre-sample huge domains to ~10·cap with :func:`hash_bucket` before the
    exact window if a hot reducer shows up; with cap ≪ sample the result
    is unchanged with overwhelming probability and the window input is
    bounded per key.
    """
    if blocklist:
        df = df.filter(~F.col(domain_col).isin(*blocklist))
    order = order_cols if order_cols is not None else [
        F.col("n_chars").desc(), F.col(id_col)]
    w = W.partitionBy(domain_col).orderBy(*order)
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap).drop("_rn"))


def seeded_shuffle(df: DataFrame, seed: str | int = 0, n_shards: int = 8,
                   id_col: str = "doc_id") -> DataFrame:
    """Deterministic global training-order shuffle: assign every row a
    (shard, pos) from md5(seed‖id) so the corpus ordering is reproducible
    across runs, appends re-slot stably, and changing the seed is a full
    reshuffle. This is the data-ordering step before sequence packing —
    training runs need the exact same byte order on retry.

    ``shard`` = high hash bits mod n_shards; ``pos`` = rank of the hash
    within the shard. Consuming shards in index order then rows in pos
    order yields the canonical seeded permutation of the corpus.

    Scale shape: shard assignment is a pure projection; the per-shard rank
    is ONE shuffle keyed by shard — and because md5 is uniform the shards
    are balanced by construction, so the window has no skew (unlike a
    global orderBy, which needs a range-sampling pass and a total sort).
    md5 (not xxhash64) keeps the permutation reproducible by external
    systems and the SQL oracle.
    """
    hk = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    shard = (F.conv(F.substring(hk, 1, 4), 16, 10).cast("int") % n_shards)
    w = W.partitionBy("shard").orderBy(F.col("_hk"), F.col(id_col))
    return (df.withColumn("_hk", hk)
            .withColumn("shard", shard.cast("int"))
            .withColumn("pos", F.row_number().over(w).cast("bigint"))
            .drop("_hk"))


def uniform_sample_k(df: DataFrame, k: int, seed: str | int = 0,
                     id_col: str = "doc_id") -> DataFrame:
    """EXACT-size uniform sample without replacement: the k rows with the
    smallest ``md5(seed‖id)`` — a deterministic reservoir sample (every
    row's hash is an iid uniform draw, so the bottom-k is a uniform
    k-subset). Where ``hash_split``/Bernoulli give a *fraction* with
    binomial jitter, this gives exactly k — what eval-set carving and
    fixed-budget annotation jobs need — and it re-draws stably: the same
    (seed, corpus) always yields the same sample, append-only growth
    only swaps rows when a new id hashes below the current boundary.

    Scale shape: NO full sort and no shuffle of the data — Catalyst
    compiles orderBy+limit to ``TakeOrderedAndProject`` (per-partition
    bottom-k heaps, then a k-row merge on the driver), so the network
    moves O(partitions·k), not O(rows). Keep k in the 10⁶ range at most;
    for larger exact samples switch to hash_split's fraction + a trim
    pass. The id tie-break is unreachable (md5 collisions) but keeps the
    plan formally deterministic.
    """
    hk = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    return (df.withColumn("_hk", hk)
            .orderBy("_hk", id_col).limit(int(k)).drop("_hk"))


def nested_subsamples(df: DataFrame,
                      permilles: tuple[int, ...] = (10, 100, 1000),
                      seed: str | int = 0,
                      id_col: str = "doc_id") -> DataFrame:
    """NESTED ablation draws for scaling-law experiments: every row gets
    a uniform md5 permille bucket and a ``tier`` — the smallest
    configured draw that contains it — so ``tier ≤ p`` is the p‰ sample
    and draw(1%) ⊂ draw(10%) ⊂ draw(100%) BY CONSTRUCTION. Scaling
    curves need exactly this: each smaller corpus must be a subset of
    the larger one, or the ablation conflates data volume with data
    identity; re-drawing independently at each size (what repeated
    ``sample()`` calls give you) breaks that.

    Deterministic (seed‖id hashing — same draws on every run and
    engine), append-stable (new rows slot into their tier without
    re-shuffling old ones), shuffle-free projection. ``tier`` is NULL
    for rows outside the largest draw.
    """
    hk = (F.conv(F.substring(F.md5(F.concat(
        F.lit(f"{seed}:"), F.col(id_col).cast("string"))), 1, 6),
        16, 10).cast("bigint") % 1000)
    tier = F.lit(None).cast("int")
    for p in sorted(permilles, reverse=True):
        tier = F.when(F.col("bucket_permille") < p, F.lit(int(p))) \
            .otherwise(tier)
    return (df.withColumn("bucket_permille", hk.cast("int"))
            .withColumn("tier", tier))


def priority_sample_k(df: DataFrame, k: int, weight_col: str,
                      seed: str | int = 0,
                      id_col: str = "doc_id") -> DataFrame:
    """Weighted exact-k sample with UNBIASED subset-sum estimation —
    priority sampling (Duffield–Lund–Thorup 2007): each row draws a
    deterministic uniform from md5, gets priority ``q = w/u``, the top-k
    by priority are kept, and each survivor carries the weight estimate
    ``ŵ = max(w, τ)`` where τ is the (k+1)-st priority. ``Σ ŵ`` over the
    sample estimates the TRUE total weight of any subpopulation — the
    property that makes a 10⁶-row sample answer "how many training
    tokens does domain X contribute?" about a 10¹² -row corpus, which a
    plain weighted draw cannot do without bias.

    Integer end to end: u is a 48-bit hash slice, ``q = w·2⁴⁸ DIV
    (h+1)`` (units of weight, exact), τ and ŵ are bigints — the oracle
    reproduces every value. Headroom: ``w < 2¹⁵`` keeps ``w·2⁴⁸`` inside
    int64; for heavier weights shrink the hash to 2⁴⁰ (estimator
    precision loss is ~2⁻⁴⁰, irrelevant). Determinism: same (seed,
    corpus) → same sample; ties are broken by id but are unreachable
    through md5 in practice.

    Scale shape: a shuffle-free projection + TWO TakeOrderedAndProject
    passes (top-(k+1) to find τ, top-k for the sample — per-partition
    heaps, O(partitions·k) network, no sort shuffle), then a broadcast
    1-row τ join. Requires ``count(df) > k`` (with ≤ k rows every row is
    its own certainty sample; take the corpus instead of sampling).
    """
    scale = 1 << 48
    hk = F.conv(F.substring(F.md5(F.concat(
        F.lit(f"{seed}:"), F.col(id_col).cast("string"))), 1, 12),
        16, 10).cast("bigint")
    w = F.col(weight_col).cast("bigint")
    pri = (df.withColumn("_h", hk)
           .withColumn("_q", F.expr(
               f"(CAST({weight_col} AS BIGINT) * {scale}) "
               f"DIV (_h + 1)")))
    topk1 = pri.orderBy(F.col("_q").desc(), F.col(id_col)).limit(k + 1)
    tau = topk1.agg(F.min("_q").alias("_tau"))
    sample = topk1.orderBy(F.col("_q").desc(), F.col(id_col)).limit(k)
    return (sample.crossJoin(F.broadcast(tau))
            .withColumn("w_hat", F.greatest(w, F.col("_tau")))
            .drop("_h", "_q", "_tau"))


def percentile_filter(df: DataFrame, score_col: str,
                      drop_permille: int = 100) -> DataFrame:
    """Adaptive threshold filter: drop the bottom ``drop_permille``/1000 of
    rows by ``score_col`` — the data-driven cousin of a fixed quality
    cutoff (corpora differ; "drop the worst decile" transfers, a constant
    does not).

    EXACT, not approximate, and with NO global sort: quality-style scores
    are low-cardinality (this repo's are rounded to 2–4 dp), so the score
    histogram is tiny regardless of corpus size. One value-keyed aggregate
    builds it, a window over the ≤10⁴ distinct values (single tiny
    partition — of aggregate rows, never data) finds the cutoff P = the
    smallest score whose cumulative count exceeds the drop budget
    ``(total·drop_permille) DIV 1000``, and the filter ``score >= P`` is a
    broadcast-joined projection. Ties at the boundary are resolved by
    VALUE (the whole boundary score survives), which keeps the operator
    deterministic and rank-free. Contrast ``approx_percentile``: a sketch
    would make the gate unverifiable and is only needed when the score is
    continuous — quantize first instead.
    """
    hist = df.groupBy(F.col(score_col).alias("_s")) \
        .agg(F.count("*").alias("_c"))
    w = W.orderBy("_s").rowsBetween(W.unboundedPreceding, W.currentRow)
    tot = hist.agg(F.sum("_c").alias("_tot"))
    cut = (hist.withColumn("_cum", F.sum("_c").over(w))
           .crossJoin(F.broadcast(tot))
           .filter(F.col("_cum") > F.expr(
               f"(_tot * {int(drop_permille)}) DIV 1000"))
           .agg(F.min("_s").alias("_p")))
    return (df.crossJoin(F.broadcast(cut))
            .filter(F.col(score_col) >= F.col("_p"))
            .drop("_p"))


def mixture_sample(df: DataFrame, weights_permille: dict[str, int],
                   total: int, stratum_col: str = "source",
                   id_col: str = "doc_id") -> DataFrame:
    """Training-mixture composition (the Pile/Dolma-style "data mixing"
    step): draw a corpus of ~``total`` documents with per-source budgets
    ``floor(total · weight_permille/1000)``, taking each source's docs in
    deterministic md5(id) order — reproducible across runs, stable under
    appends, and exactly sized per component.

    Sources absent from ``weights_permille`` contribute nothing (budget
    0); a source with fewer docs than its budget contributes everything
    it has (the mixture under-fills rather than substituting — surface
    that in pipeline monitoring, don't silently rebalance).

    Scale shape: one shuffle keyed by the stratum for the per-source rank
    (same as :func:`stratified_sample`); the budget lookup is a literal
    CASE chain. For sources big enough to make a hot window partition,
    Bernoulli pre-thin with :func:`hash_bucket` to ~2× the budget first —
    the final exact rank is unchanged with overwhelming probability.
    """
    hk = F.md5(F.col(id_col).cast("string"))
    w = W.partitionBy(stratum_col).orderBy(hk, F.col(id_col))
    budget = F.lit(0)
    for k, pm in weights_permille.items():
        budget = F.when(F.col(stratum_col) == k,
                        F.lit((total * int(pm)) // 1000)).otherwise(budget)
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= budget).drop("_rn"))


def bernoulli_stratified(df: DataFrame, fractions: dict[str, float],
                         stratum_col: str, id_col: str = "doc_id",
                         default_fraction: float = 0.0) -> DataFrame:
    """Per-stratum Bernoulli sampling with NO shuffle: keep a row iff its
    id-hash bucket < fraction(stratum)·100. Sample size is binomial around
    n·f rather than exact — the price of a fully pipelined plan."""
    b = hash_bucket(F.col(id_col))
    frac = F.lit(default_fraction)
    for k, f_ in fractions.items():
        frac = F.when(F.col(stratum_col) == k, F.lit(f_)).otherwise(frac)
    return df.filter(b < frac * _N_BUCKETS)


def group_sample_k(df: DataFrame, k: int, group_col: str,
                   seed: str | int = 0,
                   id_col: str = "doc_id") -> DataFrame:
    """EXACT-k uniform sample WITHIN every group — the per-source sibling
    of :func:`uniform_sample_k` (which draws one global bottom-k). This
    is the "carve 1,000 eval docs from every source/language" shape:
    each group independently keeps its k smallest ``md5(seed‖id)`` rows,
    so every group's draw is a uniform k-subset, reproducible across
    runs, and append-stable (a new row only displaces the group's
    current max-hash survivor). Groups smaller than k survive whole.

    Scale shape: ONE shuffle keyed by the group column (rank via a
    group-partitioned window). Unlike the global variant there is no
    TakeOrdered escape — rank-within-group needs the group co-located —
    so a pathologically hot group makes a hot window partition; for that
    regime Bernoulli pre-thin each group to ~2k with
    :func:`hash_bucket` (displacement probability vanishes) before the
    exact rank, exactly as :func:`mixture_sample` documents.
    """
    hk = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    w = W.partitionBy(group_col).orderBy(F.col("_hk"), F.col(id_col))
    return (df.withColumn("_hk", hk)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= int(k)).drop("_hk", "_rn"))


def temperature_mixture_plan(df: DataFrame, group_col: str = "lang",
                             alpha: float = 0.5,
                             budget_rows: int | None = None) -> DataFrame:
    """Temperature-based mixture plan (XLM-R / mT5 style): per-group
    sampling shares ∝ n_g^α, flattening the natural distribution so
    low-resource groups (languages, sources) are over-represented
    relative to their raw counts. Returns one row per group:
    ``(group, n, target_rows, epochs_e6, keep_ppm)`` where ``epochs_e6``
    is the group's repeat factor in 1e-6 units (>1e6 ⇒ the trainer
    should upsample/repeat) and ``keep_ppm`` the downsample fraction
    (≤1e6, for :func:`apply_mixture_plan`).

    Exactness: α = 0.5 is the gated default because ``sqrt`` is
    IEEE-correctly-rounded in every engine, and the weight is quantized
    to integer micro-units BEFORE normalization (``w6 = floor(sqrt(n)·
    10⁶)``), so shares and targets are pure integer arithmetic — the
    plan is bit-identical across engines and layouts. Other α use
    ``pow``, whose last-ulp behavior is libm-dependent (fine for
    production, not for a hash-compared gate). DECIMAL(38,0) carries the
    budget·w6 product (can exceed int64), mirroring the x33 HUGEINT
    discipline.

    Scale shape: one group-keyed count aggregate (map-side combined) over
    (group) — bytes moved are O(groups); everything after operates on
    aggregate rows only.
    """
    counts = df.groupBy(F.col(group_col).alias("grp")) \
        .agg(F.count("*").alias("n"))
    if alpha == 0.5:
        w = F.sqrt(F.col("n"))
    else:
        w = F.pow(F.col("n"), F.lit(float(alpha)))
    w6 = F.floor(w * F.lit(1_000_000.0)).cast("decimal(38,0)")
    budget = int(budget_rows) if budget_rows is not None else None
    # z and the default budget (total rows) come from ONE window pass over
    # the O(groups) aggregate rows — a single tiny SinglePartition exchange
    full = W.partitionBy()
    plan = (counts.withColumn("w6", w6)
            .withColumn("z", F.sum("w6").over(full))
            .withColumn("tot_rows", F.sum("n").over(full)))
    b = (F.lit(budget).cast("decimal(38,0)") if budget is not None
         else F.col("tot_rows").cast("decimal(38,0)"))
    target = F.floor(b * F.col("w6") / F.col("z")).cast("bigint")
    return (plan.withColumn("target_rows", target)
            .withColumn("epochs_e6",
                        F.expr("target_rows * 1000000 DIV n"))
            .withColumn("keep_ppm",
                        F.least(F.lit(1_000_000).cast("bigint"),
                                F.col("epochs_e6")))
            .select(F.col("grp").alias(group_col), "n", "target_rows",
                    "epochs_e6", "keep_ppm"))


def apply_mixture_plan(df: DataFrame, plan: DataFrame,
                       group_col: str = "lang",
                       id_col: str = "doc_id",
                       seed: str | int = 0) -> DataFrame:
    """Apply a :func:`temperature_mixture_plan`: Bernoulli-downsample
    over-represented groups by the deterministic md5 ppm bucket
    (``bucket(seed‖id) < keep_ppm``) and carry ``epochs_e6`` so the
    trainer can repeat under-represented groups — rows are never
    duplicated here (a 100 TB corpus is repeated by the data LOADER, not
    materialized twice). Plan join is broadcast (O(groups) rows); the
    filter is a pure projection — zero shuffles end to end.
    """
    ppm = F.pmod(
        F.conv(F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"),
                           F.col(id_col).cast("string"))), 1, 8),
            16, 10).cast("bigint"),
        F.lit(1_000_000)).cast("bigint")
    return (df.join(F.broadcast(plan.select(
                group_col, "keep_ppm", "epochs_e6")), group_col)
            .filter(ppm < F.col("keep_ppm"))
            .drop("keep_ppm"))


def curriculum_phases(df: DataFrame, score_col: str, n_phases: int = 4,
                      seed: str | int = 0,
                      id_col: str = "doc_id") -> DataFrame:
    """Curriculum ordering: assign every row a training phase 1..P by
    score (phase 1 = highest-quality rows first) and a seeded in-phase
    order key — the trainer reads ``ORDER BY phase, ord`` so quality
    anneals across training (curriculum-learning shape; the inverse
    ordering is anti-curriculum).

    EXACT and sort-free, same discipline as :func:`percentile_filter`:
    scores are low-cardinality (quantized), so one value-keyed aggregate
    builds the score histogram, a window over AGGREGATE rows computes
    each score's strictly-above cumulative count, and
    ``phase = 1 + (cum_above · P) DIV total`` broadcasts back as a pure
    projection. Boundary ties share the earlier phase (whole score
    groups stay together — deterministic, rank-free). No global sort
    ever touches the data; at 100 TB the final layout is one
    range-partitioned write keyed by (phase, ord).
    """
    hist = df.groupBy(F.col(score_col).alias("_s")) \
        .agg(F.count("*").alias("_c"))
    w = (W.orderBy(F.col("_s").desc())
         .rowsBetween(W.unboundedPreceding, -1))
    cuts = (hist
            .withColumn("_above", F.coalesce(F.sum("_c").over(w),
                                             F.lit(0)))
            .withColumn("_tot", F.sum("_c").over(W.partitionBy()))
            .select(F.col("_s"),
                    (F.lit(1) + F.expr(
                        f"_above * {int(n_phases)} DIV _tot"))
                    .cast("int").alias("phase")))
    ord_key = F.md5(F.concat(F.lit(f"{seed}:"),
                             F.col(id_col).cast("string")))
    return (df.join(F.broadcast(cuts),
                    df[score_col] == cuts["_s"]).drop("_s")
            .withColumn("ord", ord_key))
