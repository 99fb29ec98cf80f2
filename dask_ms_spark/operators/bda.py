"""Baseline-dependent averaging (BDA) for Measurement-Set-shaped data.

BDA is the canonical MS downstream reduction the reference's grouping
machinery exists to feed: rows are binned in time per baseline, with a
bin width that SHRINKS as the baseline gets longer (long baselines
decorrelate faster, so they tolerate less averaging).  The reference
ecosystem's BDA tool (ratt-ru/xova) is built directly on dask-ms'
group/order substrate (reference: daskms/ordering.py:1-120 group
partitioning, daskms/reads.py:58-75 chunked column reads); here the
whole reduction is ONE declarative Spark plan.

Scale shape
-----------
* The averaging factor is pure row-local arithmetic on the baseline's
  uv-distance — no lookup table, no shuffle, no driver round trip.
* The tensor (DATA/FLAG) reduction reuses
  :func:`~dask_ms_spark.operators.grouping.tensor_row_average`'s
  (group, position)-keyed aggregation: payload cells shuffle exactly
  once, and a hot baseline's cells spread across reducers.
* The scalar reduction (TIME centroid, weight sum, row count) is a
  second aggregation over the SAME leading keys, so AQE plans both
  sides of the final join with co-partitioned exchanges; the join
  itself carries only (group-key, small-scalar) rows.
* ``quantize_scale`` applies the repo's fixed-point discipline so the
  averaged cells are bit-identical under any shuffle order and
  engine-portable for the DuckDB oracle.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, Window, functions as F

from .grouping import tensor_row_average

__all__ = ["bda_factor", "bda_average", "flag_summary"]


def bda_factor(uvdist, ref_uvdist: float, max_factor: int = 16):
    """Averaging factor for a baseline: ``clamp(floor(ref/uv), 1, max)``.

    ``ref_uvdist`` is the uv-distance that gets NO extra averaging
    (factor 1); a baseline half that length may average 2x longer, etc.
    Autocorrelations (uv = 0) and anything shorter than
    ``ref_uvdist / max_factor`` cap at ``max_factor``.  Negative or
    NULL uv-distances are a data error and raise at execution time
    rather than silently averaging everything into one bin.
    """
    if ref_uvdist <= 0:
        raise ValueError(f"bda_factor: ref_uvdist must be > 0, "
                         f"got {ref_uvdist}")
    if max_factor < 1:
        raise ValueError(f"bda_factor: max_factor must be >= 1, "
                         f"got {max_factor}")
    uv = F.when(uvdist.isNull() | (uvdist < 0), F.raise_error(F.lit(
        "bda_factor: uv-distance is NULL or negative"))).otherwise(uvdist)
    raw = F.floor(F.lit(float(ref_uvdist)) / uv)
    return (F.when(uv == 0, F.lit(max_factor))
             .otherwise(F.greatest(F.lit(1),
                                   F.least(raw, F.lit(max_factor))))
             .cast("int"))


def bda_average(df: DataFrame, time_col: str,
                baseline_cols: Iterable[str], uvdist_col: str,
                base_interval: float, ref_uvdist: float,
                max_factor: int = 16,
                data_col: str | None = None,
                flag_col: str | None = None,
                weight_col: str | None = None,
                weight_data: bool = False,
                weight_spectrum_col: str | None = None,
                chan_average: bool = False,
                time_origin: float = 0.0,
                quantize_scale: int | None = None,
                per_baseline_uvdist: bool = False,
                complex_data: bool = False) -> DataFrame:
    """Average rows per (baseline, adaptive time bin).

    Bin width is ``base_interval * bda_factor(uvdist)``; row ``r``
    lands in bin ``floor((time - time_origin) / width)``.  Outputs per
    group: the baseline columns, ``bin``, ``factor``,
    ``time_centroid`` (mean of kept rows' time), ``n_rows``, and —
    when ``data_col`` is given — ``data_mean`` (element-wise mean over
    rows where ``flag_col`` is false; a cell flagged in EVERY row
    yields NULL) plus ``flag`` (bool array, true where the mean is
    NULL) and, when ``weight_col`` is given, ``weight_sum``.

    ``time_origin`` keeps binning pure row-local arithmetic; deriving
    it from ``min(time)`` would need a 1-row broadcast aggregate — do
    that outside if required (it composes: pass the collected min).
    MS FLAG convention: ``flag_col`` true means BAD; the mean keeps
    unflagged cells.

    ``weight_data=True`` (requires ``weight_col``) makes the tensor
    mean WEIGHT-weighted — ``sum(w * v) / sum(w)`` over unflagged
    cells, the MS averaging semantic when rows carry per-row WEIGHT —
    instead of the unweighted arithmetic mean.  The per-cell plan is
    identical: the weighted sums ride the same (group, position)
    shuffle.  ``weight_spectrum_col`` weighs each CELL by that row's
    per-channel weight array instead (the MS WEIGHT_SPECTRUM
    semantic; overrides ``weight_data``).

    With the default ``per_baseline_uvdist=False`` the factor is pure
    row-local arithmetic on THAT ROW's uv-distance — which assumes
    uvdist is (near-)constant per baseline over the averaged span.  In
    a real MS uvdist drifts with time (earth rotation), so rows of one
    baseline can carry different factors — and hence different bin
    widths — while sharing the same (baseline, bin) key, mixing rows
    binned under incompatible widths.  ``per_baseline_uvdist=True``
    instead derives ONE representative uv-distance per baseline (the
    baseline's mean uvdist, a window aggregate over the same keys the
    group-by shuffles on) so every row of a baseline bins under the
    same width; this adds one window exchange co-partitioned with the
    aggregation.

    ``complex_data=True`` declares ``data_col`` as the engine's
    INTERLEAVED complex layout ([re0, im0, re1, im1, ...]): the
    per-channel ``flag_col`` mask expands to the re/im planes
    automatically either way (the sizes decide), but
    ``chan_average`` needs the declaration — binning the raw
    interleaved array would average re and im planes together, so
    the complex path bins each plane and re-interleaves.  A
    per-channel ``weight_spectrum_col`` over interleaved data must
    be pre-expanded by the caller (``c_expand_mask``-style) — the
    size guard raises otherwise.
    """
    if base_interval <= 0:
        raise ValueError(f"bda_average: base_interval must be > 0, "
                         f"got {base_interval}")
    baseline_cols = list(baseline_cols)
    uv = F.col(uvdist_col).cast("double")
    if per_baseline_uvdist:
        uv = F.avg(uv).over(Window.partitionBy(*baseline_cols))
    factor = bda_factor(uv, ref_uvdist, max_factor)
    width = F.lit(float(base_interval)) * factor.cast("double")
    t = F.col(time_col).cast("double")
    b = F.floor((t - F.lit(float(time_origin))) / width).cast("long")
    keyed = df.withColumn("__factor", factor).withColumn("__bin", b)
    keys = [*baseline_cols, "__bin"]

    if quantize_scale:
        qs = float(quantize_scale)
        t_sum = (F.sum(F.round(t * F.lit(qs)).cast("long")).cast("double")
                 / F.lit(qs))
    else:
        t_sum = F.sum(t)
    aggs = [(t_sum / F.count(F.lit(1))).alias("time_centroid"),
            F.min("__factor").alias("factor"),
            F.count(F.lit(1)).alias("n_rows")]
    if weight_col is not None:
        aggs.append(F.sum(F.col(weight_col).cast("double"))
                    .alias("weight_sum"))
    scalars = keyed.groupBy(*keys).agg(*aggs)

    if data_col is None:
        return scalars.withColumnRenamed("__bin", "bin")

    if weight_data and weight_col is None and weight_spectrum_col is None:
        raise ValueError("bda_average: weight_data=True requires "
                         "weight_col")
    if flag_col is not None:
        # MS convention: FLAG is per CHANNEL while interleaved
        # complex DATA carries 2 floats per channel — expand the mask
        # to the re/im layout when the sizes say so; a mismatched
        # pair raises instead of letting zip_with silently NULL-pad
        # half the band (review r9, the same hazard the
        # weight_is_spectrum guard covers)
        from ..functions.complexf import c_expand_mask

        keep = F.transform(F.col(flag_col), lambda fl: ~fl)
        d_sz, f_sz = F.size(data_col), F.size(flag_col)
        mask = (F.when(d_sz == f_sz, keep)
                .when(d_sz == f_sz * 2, c_expand_mask(keep))
                .otherwise(F.raise_error(F.lit(
                    "bda_average: size(flag_col) must equal "
                    "size(data_col) (real data) or size(data_col)/2 "
                    "(interleaved complex DATA)"))))
    else:
        mask = F.transform(F.col(data_col), lambda _: F.lit(True))
    if weight_spectrum_col is not None:
        wkw = dict(weight_col=weight_spectrum_col,
                   weight_is_spectrum=True)
    else:
        wkw = dict(weight_col=(weight_col if weight_data else None))
    tens = tensor_row_average(
        keyed.withColumn("__mask", mask), keys, data_col, "__mask",
        out_col="data_mean", quantize_scale=quantize_scale,
        **wkw).drop("n_rows")
    out = (scalars.join(tens, on=keys)
           .withColumn("flag", F.transform(F.col("data_mean"),
                                           lambda v: v.isNull())))
    if chan_average:
        from ..functions.vector import masked_bin_average_dyn

        if complex_data:
            # interleaved complex: a contiguous bin over the raw
            # array would average re and im planes TOGETHER
            # (c_expand_mask's documented forbidden case — review
            # r9).  Split the planes, bin each, re-interleave.
            # The planes bind to COLUMN slots first: passed inline,
            # the c_real/c_imag transforms would re-evaluate inside
            # every per-bin slice of the binning lambda (the
            # spectral_moments re-expansion class, review r9).
            from ..functions.complexf import c_imag, c_real

            out = (out.withColumn("__re", c_real(F.col("data_mean")))
                   .withColumn("__im", c_imag(F.col("data_mean"))))

            def plane_mean(plane):
                return masked_bin_average_dyn(
                    plane, F.transform(plane,
                                       lambda v: v.isNotNull()),
                    F.col("factor"))

            re_b = plane_mean(F.col("__re"))
            im_b = plane_mean(F.col("__im"))
            cmean = F.flatten(F.zip_with(
                re_b, im_b, lambda a, b: F.array(a, b)))
        else:
            cmean = masked_bin_average_dyn(
                F.col("data_mean"),
                F.transform(F.col("data_mean"),
                            lambda v: v.isNotNull()),
                F.col("factor"))
        out = (out.withColumn("data_chan_mean", cmean)
               .withColumn("flag_chan",
                           F.transform(F.col("data_chan_mean"),
                                       lambda v: v.isNull()))
               .drop("__re", "__im"))
    return out.withColumnRenamed("__bin", "bin")


def flag_summary(df: DataFrame, group_cols: Iterable[str],
                 flag_col: str) -> DataFrame:
    """Per-group flag-occupancy QA summary (the `flagstats` staple run
    after any MS flagging pass): visibility count, flagged count and
    flagged fraction per group.

    The per-row flagged count folds map-side with ``F.aggregate`` over
    the bool array — no explode, no payload shuffle; the only exchange
    is the final (group)-keyed partial-sum aggregation.
    """
    group_cols = list(group_cols)
    per_row_flagged = F.aggregate(
        F.col(flag_col), F.lit(0).cast("long"),
        lambda acc, fl: acc + F.when(fl, 1).otherwise(0).cast("long"))
    return (df.select(*group_cols,
                      F.size(flag_col).cast("long").alias("__nv"),
                      per_row_flagged.alias("__nf"))
            .groupBy(*group_cols)
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("__nv").alias("n_vis"),
                 F.sum("__nf").alias("n_flagged"))
            .withColumn("flag_frac",
                        F.col("n_flagged") / F.col("n_vis")))
