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

__all__ = ["rfi_flag"]


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
            .withColumn("__rmed", F.percentile("__x", 0.5).over(w_roll)))
    # single Python-side multiply: ONE double constant crosses into
    # the plan, so an oracle can reproduce it exactly via its integer
    # ratio (SCALE.md "double-literal double-rounding" rule)
    thr = F.lit(float(k) * 1.4826) * F.col("__mad")
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
