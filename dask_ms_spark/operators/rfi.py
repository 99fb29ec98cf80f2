"""RFI flagging — rolling robust z-score detection over per-channel
time series, the QA pass MS pipelines run between ingest and
averaging (the reference feeds exactly this shape: per-baseline
DATA/FLAG chunks, daskms/reads.py:58-75; the flagging itself is what
downstream tools like tricolour do with those chunks).

Detector: per (baseline, channel), a sample is RFI when its deviation
from the ROLLING median (trend removal — the bandpass/fringe drift
must not count as interference) exceeds ``k * 1.4826 * MAD``, with
the MAD taken globally per (baseline, channel) over pre-unflagged
samples (a rolling MAD of rolling deviations would flag its own
neighbourhood; the global spread is the stable yardstick).
Pre-flagged samples stay flagged and are excluded from every
statistic.

Scale shape: ONE exchange keyed (baseline, channel) carries ALL the
statistics — global median, global MAD and the rolling median are
window aggregates over the same partition spec, so Catalyst plans a
single shuffle + sort; the only other exchange is the final
reassembly keyed (baseline, time).  No joins, no driver round trips.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["rfi_flag", "sigma_clip", "sumthreshold_flag", "flag_grow"]


def flag_grow(df: DataFrame, time_col: str,
              baseline_cols: Iterable[str], flag_col: str,
              time_radius: int = 1, chan_radius: int = 1,
              out_col: str = "flag_grown") -> DataFrame:
    """Morphological flag dilation — the "extend/grow flags" pass MS
    pipelines run after any detector (RFI edges leak into adjacent
    samples below the detection threshold; aoflagger/tricolour and
    CASA's flagdata growtime/growfreq do exactly this on the same
    per-baseline FLAG chunks dask-ms serves, daskms/reads.py:58-75).

    A cell becomes flagged when ANY flagged cell lies within
    ``time_radius`` rows (same baseline, time-ordered) and
    ``chan_radius`` channel positions — dilation by a rectangular
    structuring element, computed SEPARABLY (grow over time, then
    over channel), which is exactly the rectangle dilation at two
    1-d passes' cost.

    Scale shape: positions explode once; the two passes are window
    maxima over (baseline, pos)-by-time and (baseline, time)-by-pos —
    keyed exchanges with no joins and no driver round trips, the
    rfi_flag layout.  ``time_col`` must be unique per baseline (the
    MS row grid).  Returns baseline cols, time, ``out_col`` (grown
    bool array) and ``n_grown`` (newly flagged cells per row).
    """
    if time_radius < 0 or chan_radius < 0:
        raise ValueError("flag_grow: radii must be >= 0, got "
                         f"({time_radius}, {chan_radius})")
    baseline_cols = list(baseline_cols)
    ex = df.select(*baseline_cols,
                   F.col(time_col).alias("__t"),
                   F.posexplode(F.col(flag_col)).alias("__pos", "__f"))
    w_t = (Window.partitionBy(*baseline_cols, "__pos").orderBy("__t")
           .rowsBetween(-time_radius, time_radius))
    w_c = (Window.partitionBy(*baseline_cols, "__t").orderBy("__pos")
           .rowsBetween(-chan_radius, chan_radius))
    grown = (ex.withColumn("__ft", F.max(F.col("__f").cast("int"))
                           .over(w_t))
             .withColumn("__fc", F.max("__ft").over(w_c) == 1))
    return (grown
            .withColumn("__new", (F.col("__fc") & ~F.col("__f"))
                        .cast("long"))
            .groupBy(*baseline_cols, "__t")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__fc"))),
                lambda s: s["__fc"]).alias(out_col),
                F.sum("__new").alias("n_grown"))
            .withColumnRenamed("__t", time_col))


def rfi_flag(df: DataFrame, time_col: str,
             baseline_cols: Iterable[str], data_col: str,
             flag_col: str | None = None,
             window: int = 3, k: float = 5.0) -> DataFrame:
    """Flag RFI per (baseline, channel): deviation from the
    ``±window``-sample rolling median beyond ``k * 1.4826 * MAD``.

    ``time_col`` must be unique per baseline (the MS row grid) — the
    rolling frame is row-based, so duplicate times would make frame
    membership nondeterministic.  Returns one row per input row:
    baseline columns, time, ``flag_rfi`` (the OR of the input flags
    and the detections) and ``n_flagged_new``.
    """
    if window < 1:
        raise ValueError(f"rfi_flag: window must be >= 1, got {window}")
    baseline_cols = list(baseline_cols)
    vec = F.transform(F.col(data_col), lambda x: x.cast("double"))
    pre = (F.col(flag_col) if flag_col
           else F.transform(F.col(data_col), lambda _: F.lit(False)))
    masked = F.zip_with(vec, pre,
                        lambda v, fl: F.when(~fl, v))
    ex = df.select(*baseline_cols,
                   F.col(time_col).alias("__t"),
                   F.posexplode(masked).alias("__pos", "__x"))

    part = [*baseline_cols, "__pos"]
    w_all = (Window.partitionBy(*part)
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    w_roll = (Window.partitionBy(*part).orderBy("__t")
              .rowsBetween(-window, window))
    st = (ex.withColumn("__med", F.percentile("__x", 0.5).over(w_all))
            .withColumn("__mad", F.percentile(
                F.abs(F.col("__x") - F.col("__med")), 0.5).over(w_all))
            .withColumn("__aad", F.avg(
                F.abs(F.col("__x") - F.col("__med"))).over(w_all))
            .withColumn("__rmed", F.percentile("__x", 0.5).over(w_roll)))
    # MAD collapses to 0 when more than half a series is one constant
    # (quantised/zero-filled channels) — the threshold then flagged
    # EVERY deviation regardless of k (review r9); fall back to the
    # MEAN absolute deviation around the median (sqrt(pi/2) rescales
    # it to sigma under normality) — linear in the outliers, so a
    # genuine spike still clears the threshold it inflates, unlike a
    # std fallback whose quadratic blow-up hides the spike itself.
    # Literal discipline: each constant crosses as ONE double so an
    # oracle reproduces it via its integer ratio (SCALE.md rule).
    scale = F.when(F.col("__mad") > 0,
                   F.lit(1.4826) * F.col("__mad")) \
        .otherwise(F.lit(1.2533141373155003)
                   * F.coalesce(F.col("__aad"), F.lit(0.0)))
    thr = F.lit(float(k)) * scale
    hit = (F.col("__x").isNotNull() & F.col("__rmed").isNotNull()
           & (F.abs(F.col("__x") - F.col("__rmed")) > thr))
    flagged = F.col("__x").isNull() | hit      # pre-flag stays flagged
    out = (st.withColumn("__fl", flagged)
             .withColumn("__new", hit.cast("long"))
             .groupBy(*baseline_cols, "__t")
             .agg(F.transform(
                 F.array_sort(F.collect_list(F.struct("__pos", "__fl"))),
                 lambda s: s["__fl"]).alias("flag_rfi"),
                 F.sum("__new").alias("n_flagged_new")))
    return out.withColumnRenamed("__t", time_col)


def sigma_clip(df: DataFrame, value_col: str,
               group_cols: Iterable[str] = (),
               k: float = 3.0, iters: int = 2,
               quantize_scale: int | None = 1 << 20) -> DataFrame:
    """Iterative sigma clipping per group — the classic robust
    mean/std estimate (clip samples beyond ``k`` standard deviations,
    re-estimate, repeat ``iters`` times).  Returns per group:
    ``clip_mean``, ``clip_std`` (sample std), ``n_kept``, ``n_in``.

    Each iteration is ONE partial-merged aggregate over the (already
    filtered) stream plus a broadcast join of the tiny per-group
    bounds back onto it — no window, no sort; at 100 TB that is
    ``iters`` scans (or one scan feeding cached intermediate at the
    planner's discretion) with group-keyed map-side combine.

    ``quantize_scale`` applies the fixed-point discipline to the sum
    and sum-of-squares accumulators, making the estimate
    shuffle-order-free and engine-exact (the registry oracle mirrors
    each iteration's arithmetic).  Size it so
    ``n_group * max(x^2) * scale < 2^63`` — the sum-of-squares
    accumulator is an int64 (pick a smaller scale, or pre-scale the
    values, for large-magnitude columns); pass ``None`` for plain
    double sums when cross-engine bit-equality is not needed.
    Groups where the std collapses to zero stop clipping (every
    remaining sample is kept).
    """
    if iters < 1:
        raise ValueError(f"sigma_clip: iters must be >= 1, got {iters}")
    if k <= 0:
        raise ValueError(f"sigma_clip: k must be > 0, got {k}")
    group_cols = list(group_cols)
    x = F.col(value_col).cast("double")
    # r12 optimization: the (group, x) projection fans out to
    # 2*iters + 2 consumers (n_in, per-iteration stats AND filter
    # legs, final stats) — Catalyst plans trees, not DAGs, so without
    # a persist every consumer re-derives the input subtree (5 scans
    # at iters=2; plan-verified).  The persisted frame is the NARROW
    # projection (group key + one double), orders of magnitude
    # smaller than a typical source table, and registers with the
    # scoped cache lifecycle like the dedup/LSH persists.
    from ..cache import scoped_persist

    cur = scoped_persist(df.select(*group_cols, x.alias("__x")))
    n_in = cur.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_in"))

    if quantize_scale:
        qs = F.lit(float(quantize_scale))

        def ssum(c):
            return (F.sum(F.round(c * qs).cast("long")).cast("double")
                    / qs)
    else:
        def ssum(c):
            return F.sum(c)

    stats = None
    for _ in range(iters):
        stats = (cur.groupBy(*group_cols)
                 .agg(ssum(F.col("__x")).alias("__s"),
                      ssum(F.col("__x") * F.col("__x")).alias("__ss"),
                      F.count(F.lit(1)).alias("__n")))
        mean = F.col("__s") / F.col("__n")
        var = F.when(F.col("__n") > 1,
                     (F.col("__ss") - F.col("__s") * F.col("__s")
                      / F.col("__n")) / (F.col("__n") - 1)) \
            .otherwise(F.lit(0.0))
        std = F.sqrt(F.greatest(var, F.lit(0.0)))
        bounds = stats.select(*group_cols, mean.alias("__m"),
                              std.alias("__sd"))
        joined = (cur.join(F.broadcast(bounds), on=group_cols)
                  if group_cols else cur.crossJoin(F.broadcast(bounds)))
        cur = (joined.where((F.col("__sd") == 0)
                            | (F.abs(F.col("__x") - F.col("__m"))
                               <= F.lit(float(k)) * F.col("__sd")))
               .select(*group_cols, "__x"))

    final = (cur.groupBy(*group_cols)
             .agg(ssum(F.col("__x")).alias("__s"),
                  ssum(F.col("__x") * F.col("__x")).alias("__ss"),
                  F.count(F.lit(1)).alias("n_kept")))
    mean = F.col("__s") / F.col("n_kept")
    var = F.when(F.col("n_kept") > 1,
                 (F.col("__ss") - F.col("__s") * F.col("__s")
                  / F.col("n_kept")) / (F.col("n_kept") - 1)) \
        .otherwise(F.lit(0.0))
    out = final.select(*group_cols, mean.alias("clip_mean"),
                       F.sqrt(F.greatest(var, F.lit(0.0)))
                       .alias("clip_std"),
                       F.col("n_kept").cast("long").alias("n_kept"))
    # join FROM n_in so a group whose every sample clipped away still
    # comes back (n_kept=0, NULL mean/std) instead of vanishing from
    # the output (review r9)
    merged = (n_in.join(out, on=group_cols, how="left") if group_cols
              else out.crossJoin(F.broadcast(n_in)))
    return merged.select(*group_cols, "clip_mean", "clip_std",
                         F.coalesce(F.col("n_kept"), F.lit(0))
                         .cast("long").alias("n_kept"), "n_in")


def sumthreshold_flag(df: DataFrame, order_col: str,
                      group_cols: Iterable[str], value_col: str,
                      chi1: float, rho: float = 1.5,
                      windows: Iterable[int] = (1, 2, 4),
                      flag_col: str | None = None) -> DataFrame:
    """SumThreshold RFI detection (Offringa et al. 2010, the
    AOFlagger combinatorial thresholding — public): a run of ``M``
    consecutive samples is flagged when its SUM exceeds
    ``M * chi_M`` with ``chi_M = chi1 / rho^log2(M)`` — wide weak
    interference that never crosses the single-sample threshold
    still trips the wider windows.  Samples already flagged by an
    earlier (narrower) pass enter later window sums AT the threshold
    value (the standard substitution that stops one hot sample from
    dragging its neighbours in).

    One direction per call (order ``order_col`` within
    ``group_cols`` — time direction for (baseline, channel) groups;
    run a second call ordered by channel for the frequency
    direction, as AOFlagger iterates).  ``order_col`` must be unique
    per group (same contract as :func:`rfi_flag`).

    Scale shape: each window size adds two FIXED row-frame window
    functions (forward run-sum + backward hit-spread) over the SAME
    (group, order) sort — Catalyst reuses one exchange + sort for
    the whole pass stack, so the plan is a single shuffle however
    many windows run.  Entirely JVM-side expressions.

    Returns the input columns plus ``st_flag`` (boolean).
    """
    import math

    group_cols = list(group_cols)
    ws = list(windows)
    if not ws or any(m < 1 for m in ws):
        raise ValueError(f"sumthreshold_flag: windows must be >= 1, "
                         f"got {ws}")
    if sorted(ws) != ws:
        raise ValueError("sumthreshold_flag: windows must ascend "
                         "(narrow passes substitute into wide ones)")
    if chi1 <= 0 or rho <= 0:
        raise ValueError("sumthreshold_flag: chi1 and rho must be > 0")

    out = df.withColumn(
        "st_flag",
        F.col(flag_col) if flag_col else F.lit(False))
    base = Window.partitionBy(*group_cols).orderBy(order_col)
    v = F.col(value_col).cast("double")
    for m in ws:
        chi = float(chi1) / float(rho) ** math.log2(m)
        used = F.when(F.col("st_flag"), F.lit(chi)).otherwise(v)
        fwd = base.rowsBetween(0, m - 1)
        bwd = base.rowsBetween(-(m - 1), 0)
        run_sum = F.sum(used).over(fwd)
        run_n = F.count(used).over(fwd)
        exceed = (run_n == m) & (run_sum > F.lit(chi * m))
        out = (out.withColumn("__exceed", exceed)
               .withColumn(
                   "st_flag",
                   F.col("st_flag")
                   | F.coalesce(F.max("__exceed").over(bwd),
                                F.lit(False)))
               .drop("__exceed"))
    return out
