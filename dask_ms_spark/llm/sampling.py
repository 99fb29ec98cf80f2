"""Deterministic sampling and dataset splits (training-pipeline staple).

Random sampling (``df.sample``) is irreproducible across runs, engines
and repartitions — useless for train/val/test splits that must stay
stable as a 100 TB corpus is re-processed.  These operators key every
decision off a portable md5-derived hash of a stable id
(``functions.text.portable_hash64``), so membership is a pure function
of (id, salt): re-runs, other engines, and incremental appends all
agree, and changing the salt draws an independent split.

All decisions are row-local (no shuffle, no state); the filter pushes
into the scan's projection stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import portable_hash64

__all__ = ["hash_bucket", "sample_by_hash", "deterministic_split",
           "sample_temperature", "curriculum_order",
           "stratified_sample", "negative_sampling",
           "sample_to_mixture", "leakage_safe_split",
           "sample_weighted", "sample_quota", "sample_unimax",
           "pack_sequences"]

_BUCKETS = 1_000_000


def _attach_rates(df, rates, key_col: str):
    """Null-safe broadcast attach of a per-stratum rate table:
    groupBy emits a NULL-key stats row, but a plain USING join never
    matches NULL = NULL, so NULL-stratum stream rows would vanish
    without any guard firing (review r8).  eqNullSafe keeps NULL a
    first-class stratum and still plans a BroadcastHashJoin
    (EqualNullSafe is an equi-join key)."""
    r = rates.withColumnRenamed(key_col, "__rk")
    return (df.join(F.broadcast(r),
                    F.col(key_col).eqNullSafe(F.col("__rk")))
            .drop("__rk"))


def hash_bucket(col: Column, n_buckets: int = _BUCKETS,
                salt: str = "") -> Column:
    """Stable bucket in [0, n_buckets) from the md5-derived hash."""
    return F.pmod(portable_hash64(col, salt), F.lit(n_buckets))


def sample_by_hash(df: DataFrame, id_col: str, rate: float,
                   salt: str = "sample") -> DataFrame:
    """Keep a deterministic ~``rate`` fraction of rows by id hash."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    cut = int(rate * _BUCKETS)
    return df.where(hash_bucket(F.col(id_col), _BUCKETS, salt) < cut)


def deterministic_split(df: DataFrame, id_col: str,
                        weights: dict[str, float] | None = None,
                        salt: str = "split",
                        out: str = "split") -> DataFrame:
    """Assign each row a split label with ~``weights`` proportions.

    Default 80/10/10 train/val/test.  Thresholds are cumulative over a
    million hash buckets, so proportions are exact to 1e-6 in
    expectation and every engine computing the same md5 agrees row for
    row.
    """
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    bucket = hash_bucket(F.col(id_col), _BUCKETS, salt)
    expr = None
    acc = 0.0
    labels = list(weights)
    for label in labels[:-1]:
        acc += weights[label]
        cond = bucket < int(acc * _BUCKETS)
        expr = F.when(cond, F.lit(label)) if expr is None \
            else expr.when(cond, F.lit(label))
    expr = (expr.otherwise(F.lit(labels[-1])) if expr is not None
            else F.lit(labels[-1]))
    return df.withColumn(out, expr)


def stratified_sample(df: DataFrame, id_col: str,
                      strata_cols: list[str] | str,
                      rates: dict, default_rate: float = 1.0,
                      salt: str = "stratum") -> DataFrame:
    """Per-stratum deterministic sampling — the materialization step
    after mixture planning (``corpus_mixture`` decides the per-source
    rates; this applies them).

    ``rates`` maps a stratum key (single value, or tuple matching
    ``strata_cols``) to a keep-rate; unlisted strata keep
    ``default_rate``.  Membership is a pure function of (id, salt) —
    the SAME hash decides across strata, so lowering one stratum's
    rate yields a strict subset of the higher-rate sample
    (nested/coordinated sampling, the property that makes corpus
    ablations comparable).  Row-local, zero shuffles: the filter
    composes into the scan.
    """
    strata = [strata_cols] if isinstance(strata_cols, str) \
        else list(strata_cols)
    for key, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {key!r} must be in [0, 1], "
                             f"got {rate}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1]")
    bucket = hash_bucket(F.col(id_col), _BUCKETS, salt)
    rate_expr = None
    for key, rate in rates.items():
        vals = (key,) if not isinstance(key, tuple) else key
        if len(vals) != len(strata):
            raise ValueError(
                f"stratum key {key!r} arity != {len(strata)} cols")
        cond = None
        for c, v in zip(strata, vals):
            leg = F.col(c) == F.lit(v)
            cond = leg if cond is None else (cond & leg)
        cut = F.lit(int(rate * _BUCKETS))
        rate_expr = F.when(cond, cut) if rate_expr is None \
            else rate_expr.when(cond, cut)
    cut_expr = F.lit(int(default_rate * _BUCKETS)) if rate_expr is None \
        else rate_expr.otherwise(F.lit(int(default_rate * _BUCKETS)))
    return df.where(bucket < cut_expr)


def sample_to_mixture(df: DataFrame, id_col: str, stratum_col: str,
                      target_weights: dict, budget_tokens: int,
                      token_col: str, default_weight: float = 1.0,
                      salt: str = "mixture") -> DataFrame:
    """Downsample each stratum so it contributes ~its target share of
    a token budget — the *execution* step for the plan
    ``corpus_mixture`` produces.

    Per stratum s with normalised weight w_s and token total T_s, the
    keep-rate is ``min(1, w_s * budget / T_s)`` (a stratum smaller
    than its target share is kept whole, not upsampled).  Membership
    reuses the coordinated ``hash_bucket`` discipline, so shrinking
    the budget yields a strict subset of the larger sample.

    Scale shape: one partial-merged aggregate over the corpus for the
    per-stratum token totals (a |strata|-row table), broadcast back,
    then a row-local hash filter — the same two-stage plan at 100 TB.
    Determinism across engines: w_s is normalised in PYTHON and baked
    as a double literal, and the rate expression is written
    ``least(1.0, w_norm * budget / T_s)`` on both sides, so IEEE
    double arithmetic agrees bit-for-bit.
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    keys = list(target_weights)
    total_w = sum(target_weights.values()) + 0.0
    if any(w < 0 for w in target_weights.values()) or default_weight < 0:
        raise ValueError("weights must be non-negative")
    if total_w <= 0:
        raise ValueError("target_weights must contain a positive weight")

    stats = (df.groupBy(stratum_col)
               .agg(F.sum(token_col).alias("__stok")))
    # the sibling samplers' fail-loud rule (review r8): a NULL or
    # non-positive token sum would make rate = least(1.0, NULL) = 1.0
    # (least SKIPS null operands) and silently keep the stratum whole
    stats = stats.select(stratum_col, F.when(
        F.col("__stok").isNull() | (F.col("__stok") <= 0),
        F.raise_error(F.lit(
            "sample_to_mixture: stratum token sum is NULL or <= 0 — "
            "check token_col"))).otherwise(F.col("__stok"))
        .alias("__stok"))
    w_expr = None
    for k in keys:
        w_norm = target_weights[k] / total_w
        cond = F.col(stratum_col) == F.lit(k)
        w_expr = F.when(cond, F.lit(w_norm)) if w_expr is None \
            else w_expr.when(cond, F.lit(w_norm))
    default_norm = default_weight / total_w
    w_expr = (w_expr.otherwise(F.lit(default_norm)) if w_expr is not None
              else F.lit(default_norm))
    rates = stats.select(
        stratum_col,
        F.least(F.lit(1.0),
                w_expr * F.lit(float(budget_tokens))
                / F.col("__stok").cast("double")).alias("__rate"))
    cut = F.floor(F.col("__rate") * F.lit(_BUCKETS)).cast("bigint")
    bucket = hash_bucket(F.col(id_col), _BUCKETS, salt)
    return (_attach_rates(df, rates, stratum_col)
            .where(bucket < cut)
            .drop("__rate"))


def pack_sequences(df: DataFrame, id_col: str, token_col: str,
                   capacity: int = 2048, n_buckets: int = 64,
                   salt: str = "pack") -> DataFrame:
    """Plan documents into fixed-capacity training contexts
    (concat-and-cut packing, the standard pre-training layout: each
    bucket's documents concatenate into one token stream and contexts
    are consecutive ``capacity``-token windows over it, so documents
    may span context boundaries).

    Documents hash-bucket into ``n_buckets`` independent streams
    (global concatenation is inherently sequential), order within a
    bucket is deterministic (by id), and each document's placement is
    a pure function of the exclusive prefix-sum of token counts:

        start   = prefix_sum(tokens)            (exclusive)
        pack    = floor(start / capacity)       (first context)
        offset  = start mod capacity
        n_spans = contexts the document touches

    Pack ids encode ``(bucket, seq)`` as ``bucket * 2^32 + seq`` —
    stable across engines.  Plan shape: one running-sum window per
    bucket partition, no driver state, no Python; every engine
    computing the same hash and ordering reproduces the layout row
    for row.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    from pyspark.sql import Window

    bucket = hash_bucket(F.col(id_col), n_buckets, salt)
    w = (Window.partitionBy("bucket").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    t = F.col(token_col).cast("long")
    staged = (df.select(F.col(id_col), t.alias("__t"),
                        bucket.alias("bucket"))
              .withColumn("__start", F.sum("__t").over(w) - F.col("__t")))
    seq = (F.col("__start") / F.lit(capacity)).cast("long")
    last_seq = ((F.col("__start") + F.greatest(F.col("__t"), F.lit(1))
                 - 1) / F.lit(capacity)).cast("long")
    return staged.select(
        id_col, F.col("__t").alias("n_tokens"),
        (F.col("bucket").cast("long") * F.lit(1 << 32) + seq)
        .alias("pack_id"),
        (F.col("__start") % F.lit(capacity)).alias("pack_offset"),
        (last_seq - seq + 1).cast("long").alias("n_spans"))


def negative_sampling(df: DataFrame, id_col: str, k: int = 4,
                      salt: str = "neg") -> DataFrame:
    """``k`` deterministic uniform negatives per anchor row for
    contrastive training pairs: ``neg_id = H(id '#' i salt) mod N``,
    bumped by one (mod N) when it collides with the anchor itself.

    Requires a dense id space ``[0, N)`` (map ids first otherwise).
    Shape at scale: a pure map-side ``k``-way explode plus a one-row
    broadcast for N — the corpus itself never shuffles, and the same
    (id, i, salt) always yields the same negative on any engine, so
    regenerated epochs and the training job agree pair for pair.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    n = df.agg(F.count(F.lit(1)).alias("_n_ids"))
    base = (df.select(F.col(id_col),
                      F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
                       .alias("neg_idx"))
              .join(F.broadcast(n)))
    h = portable_hash64(
        F.concat(F.col(id_col).cast("string"), F.lit("#"),
                 F.col("neg_idx").cast("string")), salt)
    raw = F.pmod(h, F.col("_n_ids"))
    neg = F.when(raw == F.col(id_col),
                 F.pmod(raw + 1, F.col("_n_ids"))).otherwise(raw)
    return base.select(F.col(id_col), "neg_idx",
                       neg.cast("long").alias("neg_id"))


def sample_weighted(df: DataFrame, id_col: str, weight_col: str,
                    base_rate: float = 1.0,
                    salt: str = "weighted") -> DataFrame:
    """Deterministic weighted acceptance sampling: row i survives with
    probability ``min(1, base_rate * w_i / max(w))`` — the standard
    quality-weighted corpus downsampling ("keep good documents more
    often") made reproducible: acceptance compares the row's md5
    uniform u(id) against its own normalised weight, so the sample is
    a pure function of (ids, weights), identical across engines and
    re-runs, and composable with coordinated sampling via the salt.

    One broadcast scalar (max weight), then a map-side filter that
    composes into the scan — no shuffle of the corpus.

    A NULL or non-positive max weight (all-NULL weight column, or a
    weight column of zeros/negatives) makes every acceptance
    predicate NULL/false, and a PER-ROW NULL weight would silently
    exclude just that row (biasing the sample against whatever
    subpopulation has missing weights); rather than silently
    returning wrong samples, both guards are folded INTO the
    acceptance predicate (a prunable side column would be optimised
    away), so the job FAILS with an actionable ``raise_error`` when
    the weight column is unusable (review r8: the per-row leg was
    missing).
    """
    mx = F.broadcast(df.agg(
        F.max(F.col(weight_col).cast("double")).alias("__wmax"),
        F.sum(F.col(weight_col).isNull().cast("long"))
         .alias("__wnulls")))
    u = (portable_hash64(F.col(id_col), salt).cast("double")
         / F.lit(float(1 << 60)))
    accept = u < F.least(
        F.lit(1.0),
        F.lit(float(base_rate))
        * F.col(weight_col).cast("double") / F.col("__wmax"))
    guarded = F.when(
        F.col("__wmax").isNotNull() & (F.col("__wmax") > 0)
        & (F.col("__wnulls") == 0), accept
    ).otherwise(F.raise_error(F.concat(F.lit(
        f"sample_weighted: {weight_col} unusable for acceptance "
        f"sampling — max is NULL/<= 0 or "),
        F.coalesce(F.col("__wnulls"), F.lit(0)).cast("string"),
        F.lit(" row(s) carry NULL weights; fill or filter first")))
        .cast("boolean"))
    return (df.crossJoin(mx).where(guarded)
            .drop("__wmax", "__wnulls"))


def sample_quota(df: DataFrame, id_col: str, group_col: str,
                 quota: int, salt: str = "quota") -> DataFrame:
    """Per-group quota enforcement: at most ``quota`` rows survive per
    group, chosen by md5-hash order — deterministic, unbiased within
    the group, and stable under re-runs (the cap on any single
    source's contribution that mixture balancing needs when a handful
    of domains dominate a crawl).

    One shuffle on the group key; the window rank is the standard
    top-k-per-group shape (WindowGroupLimit pushes the cap below the
    sort at scale).
    """
    from pyspark.sql import Window

    from ..functions.text import portable_hash64

    w = (Window.partitionBy(group_col)
         .orderBy(portable_hash64(F.col(id_col), salt),
                  F.col(id_col)))
    return (df.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= quota).drop("__rk"))


def sample_temperature(df: DataFrame, id_col: str, stratum_col: str,
                       alpha: float = 0.5, count_col: str | None = None,
                       salt: str = "temperature") -> DataFrame:
    """Temperature-balanced mixture sampling (the mT5/multilingual
    rebalancing): downsample each stratum so its share moves from its
    natural share ``p_s = n_s / N`` toward the temperature-adjusted
    ``q_s ∝ n_s^alpha`` — ``alpha = 1`` keeps the natural mixture,
    ``alpha -> 0`` approaches uniform across strata.

    Pure downsampling: keep-rate ``r_s ∝ n_s^(alpha-1)`` normalised so
    the largest rate is exactly 1 (the rarest stratum is kept whole,
    nothing is ever upsampled).  ``count_col`` weighs strata by a
    token/char column instead of row counts.

    Scale shape: one partial-merged aggregate for the per-stratum
    totals, a |strata|-row max, broadcast back, then a row-local
    coordinated hash filter (same ``hash_bucket`` discipline as every
    sampler here — shrinking alpha yields nested-ish, reproducible
    samples).  ``alpha = 0.5`` spells the power as ``sqrt``, which is
    IEEE-exact in every engine (pow is only ~1 ulp portable).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    n = (F.sum(F.col(count_col).cast("double")) if count_col
         else F.count(F.lit(1)).cast("double"))
    stats = df.groupBy(stratum_col).agg(n.alias("__raw"))
    # a stratum whose mass is NULL or <= 0 would turn its rate into
    # NaN and silently poison the max-normalisation (the
    # sample_weighted rule): surface the bad column instead
    stats = stats.select(stratum_col, F.when(
        F.col("__raw").isNull() | (F.col("__raw") <= 0),
        F.raise_error(F.lit(
            "sample_temperature: stratum mass is NULL or <= 0 — "
            "check count_col"))).otherwise(F.col("__raw"))
        .alias("__n"))
    powed = (F.sqrt(F.col("__n")) if alpha == 0.5
             else F.pow(F.col("__n"), F.lit(float(alpha))))
    ratios = stats.select(stratum_col,
                          (powed / F.col("__n")).alias("__ratio"))
    mx = ratios.agg(F.max("__ratio").alias("__rmax"))
    rates = (ratios.crossJoin(F.broadcast(mx))
             .select(stratum_col,
                     (F.col("__ratio") / F.col("__rmax"))
                     .alias("__rate")))
    cut = F.floor(F.col("__rate") * F.lit(_BUCKETS)).cast("bigint")
    bucket = hash_bucket(F.col(id_col), _BUCKETS, salt)
    return (_attach_rates(df, rates, stratum_col)
            .where(bucket < cut)
            .drop("__rate"))


def sample_unimax(df: DataFrame, id_col: str, group_col: str,
                  budget: float, max_epochs: float = 1.0,
                  count_col: str | None = None,
                  salt: str = "unimax") -> DataFrame:
    """UniMax mixture sampling (Chung et al., "UniMax: Fairer and
    More Effective Language Sampling", 2023 — public): allocate a
    total ``budget`` (rows, or ``count_col`` mass) as UNIFORMLY as
    possible across groups while capping each group at ``max_epochs``
    passes over its data — the multilingual mixture that avoids both
    head-language domination and tail-language over-epoching.

    The paper's iterative allocation equals capped WATERFILLING and
    has a closed form: with ``cap_g = s_g * max_epochs``, find the
    threshold ``t*`` solving ``sum_g min(cap_g, t*) = budget``; then
    ``u_g = min(cap_g, t*)`` (all caps when the budget covers them).
    Here t* is computed DECLARATIVELY on the |groups|-row stats table
    — one sort plus a running sum picks the unique valid waterfill
    segment — so there is no driver loop and no collect; the stats
    table broadcasts back onto the stream.

    Upsampling is materialised: each row emits epochs
    ``0 .. floor(u_g/s_g)`` via a sequence explode, with the final
    PARTIAL epoch kept by the coordinated hash filter (same
    ``hash_bucket`` discipline as every sampler here) — so
    ``u_g > s_g`` genuinely repeats the group's rows and a trainer
    can ORDER BY (epoch, hash) downstream.  Returns the input columns
    plus ``epoch``.
    """
    from pyspark.sql import Window

    if budget <= 0:
        raise ValueError(f"sample_unimax: budget must be > 0, "
                         f"got {budget}")
    if max_epochs <= 0:
        raise ValueError(f"sample_unimax: max_epochs must be > 0, "
                         f"got {max_epochs}")
    n = (F.sum(F.col(count_col).cast("double")) if count_col
         else F.count(F.lit(1)).cast("double"))
    stats = df.groupBy(group_col).agg(n.alias("__s"))
    stats = stats.select(group_col, F.when(
        F.col("__s").isNull() | (F.col("__s") <= 0),
        F.raise_error(F.lit(
            "sample_unimax: group mass is NULL or <= 0 — check "
            "count_col"))).otherwise(F.col("__s")).alias("__s"))
    caps = stats.withColumn("__c", F.col("__s")
                            * F.lit(float(max_epochs)))
    w = Window.orderBy("__c", group_col)
    wall = Window.orderBy("__c", group_col) \
        .rowsBetween(Window.unboundedPreceding, -1)
    b = F.lit(float(budget))
    o = (caps
         .withColumn("__j", F.row_number().over(w))
         .withColumn("__k", F.count(F.lit(1)).over(
             Window.partitionBy()))
         .withColumn("__sprev", F.coalesce(F.sum("__c").over(wall),
                                           F.lit(0.0)))
         .withColumn("__cprev", F.coalesce(F.lag("__c").over(w),
                                           F.lit(0.0)))
         .withColumn("__tj", (b - F.col("__sprev"))
                     / (F.col("__k") - F.col("__j") + 1)))
    tstar = o.agg(F.min(F.when(
        (F.col("__tj") <= F.col("__c"))
        & (F.col("__tj") >= F.col("__cprev")),
        F.col("__tj"))).alias("__tstar"))
    rates = (caps.crossJoin(F.broadcast(tstar))
             .select(group_col,
                     (F.least(F.col("__c"),
                              F.coalesce(F.col("__tstar"),
                                         F.col("__c")))
                      / F.col("__s")).alias("__rt")))
    full = F.floor(F.col("__rt")).cast("int")
    cut = F.floor((F.col("__rt") - F.floor(F.col("__rt")))
                  * F.lit(_BUCKETS)).cast("bigint")
    bucket = hash_bucket(F.col(id_col), _BUCKETS, salt)
    return (_attach_rates(df, rates, group_col)
            .select("*", F.explode(F.sequence(F.lit(0), full))
                    .alias("epoch"))
            .where((F.col("epoch") < full) | (bucket < cut))
            .drop("__rt"))


def curriculum_order(df: DataFrame, id_col: str, score_col: str,
                     n_stages: int = 4,
                     salt: str = "curriculum") -> DataFrame:
    """Curriculum training order: rows are staged by score quantile
    (stage 0 = highest-scoring quarter first) and deterministically
    shuffled WITHIN each stage by the coordinated hash — the standard
    easy-to-hard data ordering, reproducible across runs and engines.

    Returns ``(id, score, stage, pos)`` where ``(stage, pos, id)`` is
    the total training order.  ``pos`` is the coordinated hash bucket:
    consumers ORDER BY (stage, pos, id) at write time
    (``sortWithinPartitions`` after repartitioning by stage range) —
    the operator emits SORT KEYS, not a global rank, so nothing here
    needs a single-partition window at 100 TB.  Stage thresholds are
    exact score percentiles (one 1-row broadcast aggregate).
    """
    if n_stages < 2:
        raise ValueError(f"curriculum_order: n_stages must be >= 2, "
                         f"got {n_stages}")
    score = F.col(score_col).cast("double")
    qs = [i / n_stages for i in range(1, n_stages)]
    th = df.agg(F.percentile(score, F.array(
        *[F.lit(q) for q in qs])).alias("__th"))
    d = df.select(F.col(id_col).alias("id"), score.alias("score")) \
        .crossJoin(F.broadcast(th))
    # stage 0 = top scores: count thresholds at or above the score
    stage = F.aggregate(
        F.col("__th"), F.lit(0),
        lambda acc, t: acc + F.when(F.col("score") >= t, 1)
        .otherwise(0))
    return (d.select("id", "score",
                     (F.lit(n_stages - 1) - stage).cast("int")
                     .alias("stage"),
                     hash_bucket(F.col("id"), _BUCKETS, salt)
                     .alias("pos")))


def leakage_safe_split(df: DataFrame, pairs: DataFrame,
                       id_col: str = "doc_id",
                       src: str = "id_a", dst: str = "id_b",
                       weights: dict[str, float] | None = None,
                       salt: str = "split",
                       out: str = "split") -> DataFrame:
    """Train/val/test split that can never leak near-duplicates
    across the boundary: documents are first grouped into transitive
    near-dup clusters (``pairs`` is the candidate edge list, e.g.
    from ``minhash_lsh_pairs``), then the WHOLE cluster is assigned
    to one split by hashing the cluster id — so a test document's
    near-copy cannot sit in train.  The standard eval-hygiene step a
    per-document split (:func:`deterministic_split`) misses: with
    d% duplication, per-doc splitting leaks ~d% of the eval set.

    Scale shape: the component labelling is the dedup-cluster
    contraction (O(log n) rounds over the candidate EDGES — 8-byte
    id pairs, never documents, ``operators/graph.py``); the split
    decision is one row-local hash of the component id; the label
    rides back on an id-keyed join.  Singletons (no near-dup) get
    their own id as component, so they split independently exactly
    like :func:`deterministic_split`.

    Returns ``df`` plus ``component`` and ``out`` columns.
    """
    from ..operators.graph import connected_components

    comps = connected_components(
        pairs, src, dst,
        nodes=df.select(F.col(id_col).alias("id")))
    labeled = deterministic_split(comps, "component", weights, salt,
                                  out)
    return df.join(
        labeled.select(F.col("id").alias(id_col), "component", out),
        id_col)
