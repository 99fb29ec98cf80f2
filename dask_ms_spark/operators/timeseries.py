"""Time-series resampling with gap filling and forward fill.

The reference has no time-series surface (its TIME axis is a plain
sort/group column, SURVEY §2.3-2.4); this is the hypertable-style
rollup a telemetry/event pipeline needs: regularise an irregular event
stream onto a fixed bucket grid per key, materialise the missing
buckets, and carry the last observation forward.

Scale shape (100 TB events):

* bucketing is a map-side integer projection (``timestampdiff`` from a
  fixed origin — codegen, no timezone access, NTZ-safe);
* the per-(key, bucket) aggregate is one partial-merged shuffle —
  the only corpus-sized exchange in the plan;
* the grid is generated *from the aggregate* (per-key min/max +
  ``sequence`` explode), so its row count is bounded by
  keys × buckets, independent of raw event volume;
* the forward fill is one window per key over the already-small grid.

The bucket index is emitted as a plain ``bigint`` (buckets since
``origin``) rather than a timestamp: downstream joins/sorts on int64
beat timestamp comparisons, and reconstruction is
``timestampadd(SECOND, bucket * step, origin)`` when a display
timestamp is wanted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["bucket_index", "resample_fill", "bucket_aggregate",
           "merge_rollups", "windowed_ema", "sessionize",
           "rolling_outliers", "cusum_changepoints",
           "cusum_segments", "interpolate_linear"]

#: Fixed epoch for bucket arithmetic.  A constant (rather than the
#: stream's own minimum) keeps bucket ids stable across incremental
#: runs — append tomorrow's events and yesterday's buckets don't move.
DEFAULT_ORIGIN = "2024-01-01 00:00:00"


def bucket_index(ts_col: str, step_seconds: int,
                 origin: str = DEFAULT_ORIGIN):
    """Integer bucket id for the named timestamp column: complete
    ``step_seconds`` periods since ``origin``.

    Uses ``timestampdiff(SECOND, ...)`` which accepts TIMESTAMP and
    TIMESTAMP_NTZ alike without dragging the session timezone into
    the arithmetic (naive-micros parquet reads as NTZ in Spark 4).
    ``origin`` must lie on a bucket boundary for engines that count
    boundary crossings (DuckDB ``date_diff``) to agree with engines
    that count complete periods (Spark ``timestampdiff``).
    """
    # MICROSECOND diff (exact bigint) + pmod floor-division: a
    # SECOND-granular timestampdiff truncates toward zero, which put
    # pre-origin sub-second timestamps one bucket late (review r8);
    # (d - pmod(d, us)) / us is exact floor for either sign.  The
    # quotient runs through DECIMAL division (exact — the numerator
    # is a multiple of us by construction): Spark's `/` on bigints is
    # DOUBLE division, which loses ulps past 2^53 microseconds
    # (~285 years from origin) and truncated boundary events one
    # bucket early (review r9).
    us = step_seconds * 1_000_000
    d = F.expr(f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '{origin}', "
               f"cast({ts_col} as timestamp_ntz))")
    num = (d - F.pmod(d, F.lit(us))).cast("decimal(30,0)")
    return (num / F.lit(us).cast("decimal(20,0)")).cast("long")


def bucket_aggregate(events: DataFrame, ts_col: str = "ts",
                     key_col: str = "user_id", value_col: str = "value",
                     step_seconds: int = 3600,
                     origin: str = DEFAULT_ORIGIN) -> DataFrame:
    """Mergeable per-(key, bucket) rollup: ``(key, bucket, n_events,
    v_sum)``.

    Deliberately stores *sums and counts* — the associative partial
    form — rather than averages, so rollups over disjoint event sets
    combine exactly with :func:`merge_rollups`.  Cast ``value_col`` to
    a decimal type first when cross-engine bit-equality of the sums
    matters (float addition is order-sensitive; decimal is not).
    """
    bucket = bucket_index(ts_col, step_seconds, origin)
    return (events
            .groupBy(F.col(key_col).alias("key"), bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(value_col).alias("v_sum")))


def merge_rollups(*rollups: DataFrame) -> DataFrame:
    """Combine mergeable rollups from disjoint event sets exactly.

    The continuous-aggregate maintenance step: yesterday's persisted
    rollup + today's delta rollup -> the rollup of the union, without
    re-aggregating history.  At 100 TB this is the difference between
    re-reading the corpus and shuffling only the delta's touched
    (key, bucket) groups — and when the persisted rollup is stored
    bucketed on (key, bucket), the merge is co-partitioned with no
    history shuffle at all.

    Exactness is by construction: counts and sums are associative, so
    merge(agg(A), agg(B)) == agg(A ∪ B) for disjoint A, B (the
    property the oracle checks end-to-end).
    """
    if not rollups:
        raise ValueError("need at least one rollup")
    u = rollups[0]
    for r in rollups[1:]:
        u = u.unionByName(r)
    return (u.groupBy("key", "bucket")
             .agg(F.sum("n_events").alias("n_events"),
                  F.sum("v_sum").alias("v_sum")))


def resample_fill(events: DataFrame, ts_col: str = "ts",
                  key_col: str = "user_id", value_col: str = "value",
                  step_seconds: int = 3600,
                  origin: str = DEFAULT_ORIGIN) -> DataFrame:
    """Per-key fixed-grid resample: bucket averages, gap buckets
    materialised, values forward-filled.

    Returns ``(key, bucket, n_events, v_avg, v_filled, is_gap)`` —
    one row per (key, bucket) over each key's observed [min, max]
    bucket range.  ``is_gap`` marks buckets the grid materialised
    (no events at all — derived from the join miss, NOT from a null
    average, so a bucket whose events carry only null values counts
    as observed); ``v_filled`` carries the last non-null bucket
    average forward.
    """
    bucket = bucket_index(ts_col, step_seconds, origin)

    # agg feeds BOTH the per-key range aggregate (grid generation)
    # and the grid join, and the whole scan + bucket aggregate
    # executes twice (final-AQE-plan verified).  A pin was A/B'd in
    # r13 and REJECTED (1.20x slower for resample_interp AND
    # resample_fill): the persist's materialisation barrier costs
    # more than the recomputed narrow aggregate, and the pinned
    # relation starves the grid join of statistics.
    agg = (events
           .groupBy(F.col(key_col).alias("key"),
                    bucket.alias("bucket"))
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.round(F.avg(value_col), 6).alias("v_avg")))

    # Grid from the aggregate, not the raw stream: keys × buckets rows.
    rng = agg.groupBy("key").agg(F.min("bucket").alias("lo"),
                                 F.max("bucket").alias("hi"))
    grid = rng.select(
        "key", F.explode(F.sequence("lo", "hi")).alias("bucket"))

    joined = grid.join(agg, ["key", "bucket"], "left")
    w = (Window.partitionBy("key").orderBy("bucket")
               .rowsBetween(Window.unboundedPreceding, 0))
    return (joined.select(
        F.col("key").alias(key_col),
        "bucket",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "v_avg",
        F.last("v_avg", ignorenulls=True).over(w).alias("v_filled"),
        F.col("n_events").isNull().alias("is_gap")))


def interpolate_linear(df: DataFrame, key_cols, order_col: str,
                       value_col: str,
                       out_col: str = "v_interp") -> DataFrame:
    """Per-key linear interpolation of NULL values between the
    nearest non-null observations on either side.

    For a NULL at position ``b`` with previous observation
    ``(pb, pv)`` and next ``(nb, nv)``:
    ``out = pv + (nv - pv) * (b - pb) / (nb - pb)``.  Rows before the
    first or after the last observation stay NULL (no extrapolation —
    compose with :func:`resample_fill`'s forward-fill if edges need
    values); non-null rows pass through unchanged.

    Scale shape: ONE exchange keyed on the key columns; the
    backward- and forward-looking passes are two frames over the same
    window sort, so Catalyst plans a single sort with no second
    shuffle.  ``order_col`` must be numeric (bucket ids from
    :func:`bucket_index`; cast timestamps to epoch seconds first) and
    unique per key — duplicate positions would make the flanking-
    observation frames order-dependent.
    """
    key_cols = list(key_cols)
    v = F.col(value_col)
    wb = (Window.partitionBy(*key_cols).orderBy(order_col)
          .rowsBetween(Window.unboundedPreceding, 0))
    wf = (Window.partitionBy(*key_cols).orderBy(order_col)
          .rowsBetween(0, Window.unboundedFollowing))
    obs = F.when(v.isNotNull(), F.col(order_col).cast("double"))
    pv = F.last(v, ignorenulls=True).over(wb)
    pb = F.last(obs, ignorenulls=True).over(wb)
    nv = F.first(v, ignorenulls=True).over(wf)
    nb = F.first(obs, ignorenulls=True).over(wf)
    b = F.col(order_col).cast("double")
    interp = F.when(v.isNotNull(), v.cast("double")).otherwise(
        F.when(pv.isNotNull() & nv.isNotNull(),
               pv + (nv - pv) * (b - pb) / (nb - pb)))
    return df.withColumn(out_col, interp)


def windowed_ema(df: DataFrame, value_col: str = "value",
                 order_cols: tuple = ("ts", "event_id"),
                 by: str = "user_id", alpha: float = 0.8,
                 window: int = 16) -> DataFrame:
    """Exponentially weighted moving average over a bounded trailing
    row window per key — the smoothing/denoising primitive Spark's
    built-in window aggregates lack.

    A true infinite-history EMA is a sequential recurrence (no
    parallel form without a prefix-scan operator); bounding the
    history to ``window`` rows makes it a plain frame aggregate while
    keeping >99% of the mass for typical alphas (0.8^16 ~ 3e-2 tail).

    Determinism discipline: the decay weights ``alpha^lag`` are
    PRECOMPUTED driver-side and inlined as double literals (no
    runtime ``pow``, whose libm can differ across engines); the
    weighted sum runs left-to-right over the frame-ordered value list,
    so any engine mirroring the same literals and order agrees
    bit-for-bit.  Ordering must be made unique via ``order_cols``
    (e.g. (ts, event_id)) or frame contents are engine-arbitrary.

    NULL handling — observation-indexed decay: ``collect_list`` drops
    NULL values, and the weight vector is aligned to the SURVIVING
    list (``n = size(vals)``, last-``n`` weights), so NULL rows do
    not advance the decay clock — the k-th most recent *observation*
    always gets weight ``alpha^k``, never a stale slot's weight.
    This is EMA over the observation sequence, not over row lags; a
    NULL row's own ``ema`` is the EMA of its trailing observations.
    Callers wanting row-lag decay (NULLs consume a slot) should
    ``fill``/interpolate first (see :func:`resample_with_gap_fill`);
    callers wanting NULL rows excluded entirely should pre-filter.

    One shuffle on ``by``; the frame is O(window) per row.
    """
    # weights[j] = alpha^(window-1-j): weights[window-1] = 1 (current
    # row), oldest row in a full frame gets alpha^(window-1)
    weights = [float(alpha) ** (window - 1 - j) for j in range(window)]
    wlit = F.array(*[F.lit(w) for w in weights])
    frame = (Window.partitionBy(by)
             .orderBy(*[F.col(c) for c in order_cols])
             .rowsBetween(-(window - 1), Window.currentRow))
    vals = F.collect_list(F.col(value_col).cast("double")).over(frame)
    n = F.size("vals")
    # a frame with n < window rows uses the LAST n weights (newest
    # row still gets weight 1)
    idx = F.sequence(F.lit(1), n)
    nom = F.aggregate(
        idx, F.lit(0.0),
        lambda acc, i: acc + F.element_at(F.col("vals"), i)
        * F.element_at(wlit, F.lit(window) - n + i))
    den = F.aggregate(
        idx, F.lit(0.0),
        lambda acc, i: acc
        + F.element_at(wlit, F.lit(window) - n + i))
    # an all-NULL frame (e.g. the key's first rows carry NULLs) has
    # n = 0: sequence(1, 0) would step BACKWARDS to [1, 0] and
    # element_at would index out of bounds (review r8) — CaseWhen
    # evaluates the aggregate branch only when n >= 1, so such rows
    # yield a NULL ema instead of killing the job
    ema = F.when(n >= 1, F.round(nom / den, 6))
    return (df.withColumn("vals", vals)
            .withColumn("ema", ema)
            .drop("vals"))


def sessionize(events: DataFrame, ts_col: str = "ts",
               by: str = "user_id", gap_seconds: int = 1800,
               order_tiebreak: str = "event_id") -> DataFrame:
    """Batch gap-based sessionization: rows more than ``gap_seconds``
    apart (per key) start a new session.  The batch complement of the
    streaming ``sessionize_events`` (streaming/events.py) — same
    semantics, replayable over history.

    The classic two-window form: a lag-gap flag, then a running sum of
    flags numbers the sessions — both windows share one partitioning
    on ``by``, so the whole operator costs a single shuffle (plans
    show one Exchange; the second window reuses the first's sort).
    Ordering is made unique with ``order_tiebreak`` so session
    numbering is deterministic under ties.

    Adds ``session_idx`` (0-based per key) to the input rows.
    """
    epoch = F.unix_timestamp(F.col(ts_col))
    w = (Window.partitionBy(by)
         .orderBy(F.col(ts_col), F.col(order_tiebreak)))
    gap = epoch - F.lag(epoch).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    run = (Window.partitionBy(by)
           .orderBy(F.col(ts_col), F.col(order_tiebreak))
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return events.withColumn(
        "session_idx", (F.sum(new_sess).over(run) - 1).cast("long"))


def rolling_outliers(df: DataFrame, value_col: str = "value",
                     order_cols: tuple = ("ts", "event_id"),
                     by: str = "user_id", window: int = 32,
                     k: float = 1.5,
                     min_history: int = 8) -> DataFrame:
    """Tukey-fence anomaly flags against each row's own trailing
    history: a value is anomalous when it falls outside
    ``[q1 - k*IQR, q3 + k*IQR]`` of the previous ``window`` rows per
    key (current row excluded — the score must not see itself).

    Quartiles use Spark's exact ``percentile`` as a frame aggregate
    (measured bit-identical to DuckDB ``quantile_cont`` in both
    grouped and windowed form), so flags are engine-exact; rows with
    fewer than ``min_history`` predecessors are unscored (flag NULL)
    rather than scored against a meaningless tiny frame.

    One shuffle on ``by``; robust to heavy tails where a z-score
    detector is hostage to its own outliers.
    """
    frame = (Window.partitionBy(by)
             .orderBy(*[F.col(c) for c in order_cols])
             .rowsBetween(-window, -1))
    x = F.col(value_col).cast("double")
    out = (df.withColumn("__q1", F.percentile(x, 0.25).over(frame))
           .withColumn("__q3", F.percentile(x, 0.75).over(frame))
           .withColumn("__nh", F.count(x).over(frame)))
    iqr = F.col("__q3") - F.col("__q1")
    lo = F.col("__q1") - k * iqr
    hi = F.col("__q3") + k * iqr
    return (out.withColumn(
        "is_anomaly",
        F.when(F.col("__nh") >= min_history, (x < lo) | (x > hi)))
        .withColumn("fence_lo", F.round(lo, 6))
        .withColumn("fence_hi", F.round(hi, 6))
        .drop("__q1", "__q3", "__nh"))


def cusum_changepoints(df: DataFrame, value_col: str = "value",
                       order_cols: tuple = ("ts", "event_id"),
                       by: str = "event_type",
                       quantize_scale: int = 1 << 20) -> DataFrame:
    """Offline CUSUM changepoint detection per key (Page 1954 /
    Taylor's cumulative-sum changepoint method — public): with
    ``S_k = sum_{i<=k} (x_i - mean)``, the most likely single change
    point is ``argmax_k |S_k|`` and its magnitude ``max_k |S_k|``
    normalised by n gives the mean-shift scale.  The reference has no
    time-series surface (SURVEY 2.3-2.4); this is the telemetry
    drift-detector an event pipeline runs per metric stream.

    Determinism: values are int64-quantised BEFORE the running sum
    (the pagerank/kmeans fixed-point discipline), the mean enters as
    ``sum_q`` spread exactly via ``k * sum_q / n`` in int64 fixed
    point (no float accumulation order anywhere), and argmax ties
    break on the earliest position, so the result is bit-identical
    across shuffle orders and engines.

    Scale shape: ONE shuffle on ``by`` serves both the per-key totals
    (frame aggregate over the same window spec) and the running sum;
    the argmax is a per-key max-struct aggregation. Keys stream
    independently — a million metric streams parallelise; one
    grotesquely long single stream is the documented skew hazard
    (window over one key), same as every per-stream scan.
    Returns (by, n, change_pos, cusum_max_q, mean_shift) with
    ``change_pos`` the 1-based position of the pre-change segment's
    last row, ``cusum_max_q`` the max |S_k| in fixed-point units and
    ``mean_shift`` the post-minus-pre mean difference at the split.
    """
    qs = float(quantize_scale)
    xq = F.round(F.col(value_col).cast("double") * F.lit(qs)) \
        .cast("long")
    w = Window.partitionBy("by").orderBy(
        *[F.col(c) for c in order_cols])
    full = (Window.partitionBy("by")
            .orderBy(*[F.col(c) for c in order_cols])
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing))
    d = (df.select(F.col(by).alias("by"), *order_cols,
                   xq.alias("__xq"))
         .withColumn("__k", F.row_number().over(w))
         .withColumn("__run", F.sum("__xq").over(
             w.rowsBetween(Window.unboundedPreceding,
                           Window.currentRow)))
         .withColumn("__tot", F.sum("__xq").over(full))
         .withColumn("__n", F.count(F.lit(1)).over(full)))
    # S_k in exact fixed point: n*S_k = n*run_k - k*tot (int64; safe
    # while n * sum_q stays under 2^63 — quantized event values at
    # corpus scale sit far below that).
    nsk = (F.col("__n") * F.col("__run")
           - F.col("__k") * F.col("__tot"))
    scored = d.withColumn("__absns", F.abs(nsk)) \
              .withColumn("__ns", nsk)
    # argmax |S_k| with earliest-k tie break, k < n (a split must
    # leave a non-empty post segment)
    best = (scored.where(F.col("__k") < F.col("__n"))
            .groupBy("by")
            .agg(F.max_by(
                    F.struct("__k", "__ns", "__run", "__tot", "__n"),
                    F.struct(F.col("__absns"), -F.col("__k")))
                 .alias("b"),
                 F.max("__n").alias("n")))
    pre_mean = F.col("b.__run").cast("double") / F.col("b.__k")
    post_mean = ((F.col("b.__tot") - F.col("b.__run")).cast("double")
                 / (F.col("b.__n") - F.col("b.__k")))
    return best.select(
        F.col("by").alias(by), "n",
        F.col("b.__k").cast("long").alias("change_pos"),
        # |S_k| = |n*S_k| / n, back to quantized units
        F.round(F.abs(F.col("b.__ns")).cast("double") / F.col("b.__n"))
         .cast("long").alias("cusum_max_q"),
        F.round((post_mean - pre_mean) / F.lit(qs), 6)
         .alias("mean_shift"))


def cusum_segments(df: DataFrame, value_col: str = "value",
                   order_cols: tuple = ("ts", "event_id"),
                   by: str = "event_type", levels: int = 2,
                   min_seg: int = 8, min_shift: float = 0.0,
                   quantize_scale: int = 1 << 20) -> DataFrame:
    """Multiple changepoints by bounded binary segmentation (Scott &
    Knott 1974 form over the CUSUM statistic — public): split each
    key's series at its CUSUM argmax, then recurse into both halves,
    ``levels`` deep — up to ``2^levels`` segments per key.

    The recursion is a PYTHON loop over a constant ``levels`` (the
    gain_solve iteration discipline): each level is ONE exchange on
    (key, segment-path) — the per-level split table is
    (keys x segments)-sized and attaches by broadcast, so the series
    itself shuffles once per level, never per segment.  Segments
    shorter than ``2 * min_seg`` stop splitting (a split needs
    ``min_seg`` rows on each side to estimate means), a candidate
    split is ACCEPTED only when its mean shift |post - pre| reaches
    ``min_shift`` (binary segmentation without a gain threshold
    fragments noise all the way to 2^levels — set it to the smallest
    shift worth reporting), and all
    arithmetic stays in the int64 fixed point of
    :func:`cusum_changepoints`, so the segment tree is
    engine/shuffle-order deterministic.

    Returns one row per leaf segment:
    ``(by, segment, n, start_pos, end_pos, mean)`` — ``segment`` the
    binary path string ('' root, '0'/'1' halves, '00'... deeper),
    positions 1-based within the key's original order.
    """
    if levels < 1:
        raise ValueError(f"cusum_segments: levels must be >= 1, "
                         f"got {levels}")
    qs = float(quantize_scale)
    xq = F.round(F.col(value_col).cast("double") * F.lit(qs)) \
        .cast("long")
    w0 = Window.partitionBy("by").orderBy(
        *[F.col(c) for c in order_cols])
    rows = (df.select(F.col(by).alias("by"), *order_cols,
                      xq.alias("__xq"))
            .withColumn("__pos", F.row_number().over(w0))
            .withColumn("__seg", F.lit("")))

    for _ in range(levels):
        wk = (Window.partitionBy("by", "__seg")
              .orderBy(*[F.col(c) for c in order_cols]))
        full = wk.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
        d = (rows
             .withColumn("__k", F.row_number().over(wk))
             .withColumn("__run", F.sum("__xq").over(
                 wk.rowsBetween(Window.unboundedPreceding,
                                Window.currentRow)))
             .withColumn("__tot", F.sum("__xq").over(full))
             .withColumn("__n", F.count(F.lit(1)).over(full)))
        # r12: d feeds BOTH the split-candidate aggregate and the
        # re-segmentation relabel below; without a persist each
        # level re-derived the whole upstream chain twice (and the
        # relabel re-ran the same row_number window the candidate
        # leg just computed), so lineage work doubled per level.
        # One narrow persisted frame per level caps that at one
        # window sort per level (guide §2.4 shared-subtree rule).
        # Interleaved A/B at sf0.1: 0.85x (3.98 -> 3.38 s medians).
        from dask_ms_spark.cache import scoped_persist

        d = scoped_persist(d)
        nsk = (F.col("__n") * F.col("__run")
               - F.col("__k") * F.col("__tot"))
        cand = (d.where((F.col("__k") >= min_seg)
                        & (F.col("__k") <= F.col("__n") - min_seg)
                        & (F.col("__n") >= 2 * min_seg))
                .groupBy("by", "__seg")
                .agg(F.max_by(
                    F.struct("__k", "__run", "__tot", "__n"),
                    F.struct(F.abs(nsk), -F.col("__k")))
                     .alias("b")))
        shift = ((F.col("b.__tot") - F.col("b.__run")).cast("double")
                 / (F.col("b.__n") - F.col("b.__k"))
                 - F.col("b.__run").cast("double") / F.col("b.__k"))
        best = (cand.where(F.abs(shift)
                           >= F.lit(float(min_shift) * qs))
                .select("by", "__seg",
                        F.col("b.__k").alias("__split")))
        rows = (d
                .join(F.broadcast(best), ["by", "__seg"], "left")
                .withColumn("__seg", F.when(
                    F.col("__split").isNull(), F.col("__seg"))
                    .otherwise(F.concat(
                        "__seg",
                        F.when(F.col("__k") <= F.col("__split"), "0")
                         .otherwise("1"))))
                .select("by", *order_cols, "__xq", "__pos", "__seg"))

    return (rows.groupBy(F.col("by").alias(by), F.col("__seg"))
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.min("__pos").cast("long").alias("start_pos"),
                 F.max("__pos").cast("long").alias("end_pos"),
                 F.round(F.sum("__xq").cast("double")
                         / F.count(F.lit(1)) / F.lit(qs), 6)
                  .alias("mean"))
            .withColumnRenamed("__seg", "segment"))
