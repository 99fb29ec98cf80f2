"""Complex arithmetic over interleaved re/im array columns.

Spark has no complex dtype (SURVEY §1.2); following the reference's own
parquet encoding (``ComplexType = pa.list_(subtype, 2)``,
daskms/experimental/arrow/extension_types.py:178-200) a complex tensor
column is a flat ``ArrayType`` with re/im interleaved, stride 2:
``[re0, im0, re1, im1, ...]``.

All functions here are UDF-free compositions of higher-order functions
(``transform`` / ``zip_with`` / ``aggregate``) — they stay JVM-side and
inside whole-stage codegen, the Spark analogue of the reference's
vectorized numpy kernels (daskms/reads.py:40-56).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from .vector import _bind_once

__all__ = ["c_make", "c_add", "c_sub", "c_mul", "c_conj", "c_scale", "c_abs", "c_abs2", "c_real", "c_imag", "c_sum", "c_expand_mask", "phase_rotate", "LIGHT_SPEED", "apply_gains", "stokes_from_corrs", "corrs_from_stokes", "apply_gains_timevar"]


def c_make(re: Column, im: Column) -> Column:
    """Interleave two equal-length float arrays into a complex array
    (empty in, empty out; NULL in, NULL out — EITHER operand NULL
    nulls the result, matching the NULL-in/NULL-out contract of the
    other kernels: without the explicit guard a NULL ``im`` with a
    non-NULL ``re`` produced a half-populated ``[re1, NULL, ...]``
    array — r9 ADVICE).  Inputs bind once per row (review r9): the
    element_at lambda would otherwise re-evaluate expression-typed
    inputs per output slot."""
    def run(r, m):
        n = F.size(r)
        idx = F.when(n > 0, F.sequence(F.lit(0), n * 2 - 1)) \
            .when(n == 0, F.array().cast("array<int>"))
        return F.when(
            r.isNotNull() & m.isNotNull(),
            F.transform(
                idx,
                lambda i: F.when(i % 2 == 0,
                                 F.element_at(r, (i / 2).cast("int") + 1))
                           .otherwise(F.element_at(
                               m, ((i - 1) / 2).cast("int") + 1))))

    return _bind_once(run, r=re, m=im)


def c_add(a: Column, b: Column) -> Column:
    """Elementwise complex add: interleaved layout makes this a plain
    elementwise float add."""
    return F.zip_with(a, b, lambda x, y: x + y)


def c_sub(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x - y)


def _pairs(a: Column) -> Column:
    """Index sequence 0..n_complex-1 — EMPTY for an empty array
    (``sequence(0, -1)`` counts DOWN in Spark, so the unguarded form
    emitted a 2-element garbage index for zero-length inputs —
    review r9).  NULL input propagates to NULL output (a NULL
    complex cell must not silently become an empty array —
    review r9, second pass)."""
    n2 = (F.size(a) / 2).cast("int")
    return F.when(n2 > 0, F.sequence(F.lit(0), n2 - 1)) \
        .when(n2 <= 0, F.array().cast("array<int>"))


def c_mul(a: Column, b: Column) -> Column:
    """Elementwise complex multiply:
    (ar+i·ai)(br+i·bi) = (ar·br − ai·bi) + i(ar·bi + ai·br).

    Inputs bind once per row (review r9): the per-pair lambda reads
    each side twice, so a COMPOSED operand (a nested c_mul/c_conj, a
    phasor comb) would re-evaluate ~n times — O(n^2)+ at wide channel
    counts.  With the bind, composition chains like
    ``c_mul(c_mul(g_p, c_conj(g_q)), data)`` stay O(n)."""
    def run(x, y):
        def term(k: Column) -> Column:
            ar = F.element_at(x, k * 2 + 1)
            ai = F.element_at(x, k * 2 + 2)
            br = F.element_at(y, k * 2 + 1)
            bi = F.element_at(y, k * 2 + 2)
            return F.array(ar * br - ai * bi, ar * bi + ai * br)

        return F.flatten(F.transform(_pairs(x), term))

    return _bind_once(run, x=a, y=b)


def c_conj(a: Column) -> Column:
    """Complex conjugate: negate odd (imaginary) slots (empty in,
    empty out; NULL in, NULL out — see ``_pairs``)."""
    n = F.size(a)
    idx = F.when(n > 0, F.sequence(F.lit(0), n - 1)) \
        .when(n == 0, F.array().cast("array<int>"))
    return F.zip_with(a, idx,
                      lambda x, i: F.when(i % 2 == 1, -x).otherwise(x))


def c_scale(a: Column, s: Column | float) -> Column:
    """Multiply by a real scalar."""
    s = F.lit(s) if not isinstance(s, Column) else s
    return F.transform(a, lambda x: x * s)


def c_abs2(a: Column) -> Column:
    """Per-element squared magnitude: array of re²+im² (input binds
    once — see :func:`c_mul`)."""
    def run(x):
        def term(k: Column) -> Column:
            re = F.element_at(x, k * 2 + 1)
            im = F.element_at(x, k * 2 + 2)
            return re * re + im * im

        return F.transform(_pairs(x), term)

    return _bind_once(run, x=a)


def c_abs(a: Column) -> Column:
    """Per-element magnitude."""
    return F.transform(c_abs2(a), lambda x: F.sqrt(x))


def c_real(a: Column) -> Column:
    return _bind_once(
        lambda x: F.transform(_pairs(x),
                              lambda k: F.element_at(x, k * 2 + 1)),
        x=a)


def c_imag(a: Column) -> Column:
    return _bind_once(
        lambda x: F.transform(_pairs(x),
                              lambda k: F.element_at(x, k * 2 + 2)),
        x=a)


def c_sum(a: Column) -> Column:
    """Sum a complex array to a single (re, im) pair."""
    re = F.aggregate(c_real(a), F.lit(0.0), lambda acc, x: acc + x)
    im = F.aggregate(c_imag(a), F.lit(0.0), lambda acc, x: acc + x)
    return F.array(re, im)


def c_expand_mask(mask: Column) -> Column:
    """Expand a per-complex-sample boolean mask to the interleaved
    re/im layout (each flag duplicated for its sample's two planes) —
    the glue for POSITION-ALIGNED reductions over interleaved complex
    columns: ``operators.grouping.tensor_row_average`` with the
    expanded mask computes the complex mean across rows directly,
    because every interleaved position averages independently.

    NOT for within-row bin averaging: a contiguous bin over the
    interleaved array would mix re and im planes into one mean.  For
    channel averaging, reduce the planes separately and re-interleave
    — ``c_make(masked_bin_average(c_real(z), m, bin),
    masked_bin_average(c_imag(z), m, bin))``.
    """
    return F.flatten(F.transform(mask, lambda m: F.array(m, m)))


LIGHT_SPEED = 299792458.0


def phase_rotate(data: Column, u: Column, v: Column, w: Column,
                 l: float, m: float, freqs_hz: list[float]) -> Column:
    """Rephase complex visibilities to a new phase centre (the
    chgcentre / rotate-to-source primitive): multiply each channel
    sample by ``exp(-2*pi*i * (u*l + v*m + w*(n-1)) * f_k / c)`` with
    ``n = sqrt(1 - l^2 - m^2)`` — the geometric delay term of the
    measurement equation.

    ``data`` is an interleaved complex array of ``len(freqs_hz)``
    channels (types.py stride-2 convention); ``u``/``v``/``w`` are
    per-row metre columns; ``l``/``m`` the target direction cosines
    (driver-side constants, like the reference's numpy users pass).
    The per-channel phasor is built with JVM ``cos``/``sin`` over a
    per-row base angle times literal frequencies, then one
    :func:`c_mul` — the whole rotation is a single codegen'd
    projection: no shuffle, no Python, composes into the scan.
    Amplitude is preserved exactly (|phasor| = 1 up to rounding),
    which is the standard self-check.
    """
    n = math.sqrt(1.0 - l * l - m * m)
    base = (F.lit(-2.0 * math.pi) *
            (u * F.lit(float(l)) + v * F.lit(float(m))
             + w * F.lit(n - 1.0)) / F.lit(LIGHT_SPEED))
    phasor = F.flatten(F.transform(
        F.array(*[F.lit(float(f)) for f in freqs_hz]),
        lambda f: F.array(F.cos(base * f), F.sin(base * f))))
    # channel-count guard folded into the expression: a row whose
    # DATA width disagrees with the frequency comb would otherwise
    # silently emit NULL samples past the shorter array
    nf = len(freqs_hz)
    # NULL DATA cells pass through as NULL rather than tripping the
    # size guard (size(NULL) is NULL -> the otherwise branch would
    # raise on a legitimately-missing row — review r9, second pass)
    checked = F.when(F.size(data) == 2 * nf, data) \
        .when(data.isNull(), F.lit(None)) \
        .otherwise(F.raise_error(F.lit(
            f"phase_rotate: DATA has size(data)/2 channels but "
            f"{nf} frequencies were supplied")))
    return c_mul(checked, phasor)


def apply_gains(vis, gains, ant1_col: str = "ANTENNA1",
                ant2_col: str = "ANTENNA2", data_col: str = "DATA",
                antenna_col: str = "antenna", gain_col: str = "gain",
                out_col: str | None = None, mode: str = "corrupt"):
    """Apply diagonal antenna gains to visibilities per channel.

    ``mode="corrupt"`` multiplies the model INTO the gains (the
    forward measurement equation): ``V' = G_p * V_pq * conj(G_q)``.
    ``mode="correct"`` is the applycal direction — divide the
    observed data by the gains: ``V' = V_pq / (G_p * conj(G_q))``,
    spelled as multiplication by the conjugate over the squared
    magnitude so the whole correction stays in codegen (rows whose
    gain product has zero magnitude raise rather than emitting Inf).

    ``gains`` is a per-antenna table with ``gain_col`` an interleaved
    complex array matching the DATA channel count (a solution
    interval's solutions).  The gains table is tiny next to the
    visibility fact table, so both attach as BROADCAST joins — the
    correction is then a single codegen'd projection over the scan,
    no fact-table shuffle (assert broadcast in the plan; at 100 TB of
    DATA this is the difference between a free map-side pass and an
    impossible repartition).

    Rows whose antenna has NO gains entry (flagged/failed antennas
    are routinely dropped from solutions) are KEPT with a NULL
    ``out_col`` — the same left semantics as ``apply_gains_timevar``;
    the earlier inner joins silently DROPPED every baseline touching
    a missing antenna (review r9).  Filter on ``out_col IS NOT NULL``
    to discard them explicitly.
    """
    if mode not in ("corrupt", "correct"):
        raise ValueError(f"apply_gains: unknown mode {mode!r}")
    out_col = out_col or f"{data_col}_corrected"
    gp = F.broadcast(gains.select(
        F.col(antenna_col).alias(ant1_col),
        F.col(gain_col).alias("__gp")))
    gq = F.broadcast(gains.select(
        F.col(antenna_col).alias(ant2_col),
        F.col(gain_col).alias("__gq")))
    checked = F.when(
        (F.size("__gp") == F.size(F.col(data_col)))
        & (F.size("__gq") == F.size(F.col(data_col))),
        F.col(data_col)).otherwise(F.raise_error(F.lit(
            "apply_gains: gain channel count disagrees with DATA")))
    gprod = c_mul(F.col("__gp"), c_conj(F.col("__gq")))
    if mode == "corrupt":
        corrected = c_mul(gprod, checked)
    else:
        # V / g = V * conj(g) / |g|^2, channel-wise; |g|^2 expanded
        # to interleaved layout so the divide is one zip_with
        mag2 = c_expand_mask(c_abs2(gprod))
        mag2 = F.transform(mag2, lambda m: F.when(
            m > 0, m).otherwise(F.raise_error(F.lit(
                "apply_gains: zero-magnitude gain product — cannot "
                "correct; flag the antenna instead"))))
        corrected = F.zip_with(c_mul(checked, c_conj(gprod)), mag2,
                               lambda v, m: v / m)
    # NULL-out, not drop: missing-antenna rows survive with out_col
    # NULL (left joins), and the size/zero checks above only fire
    # when BOTH gains AND the data cell are present (a NULL DATA cell
    # would otherwise NULL the size comparison and trip the
    # raise_error branch — review r9, second pass)
    corrected = F.when(F.col("__gp").isNotNull()
                       & F.col("__gq").isNotNull()
                       & F.col(data_col).isNotNull(), corrected)
    return (vis.join(gp, ant1_col, "left").join(gq, ant2_col, "left")
            .withColumn(out_col, corrected)
            .drop("__gp", "__gq"))


def _corr_pair(vis: Column, idx: int) -> tuple[Column, Column]:
    """(re, im) of correlation ``idx`` in a 4-correlation interleaved
    complex array [c0_re, c0_im, c1_re, c1_im, ...]."""
    return (F.element_at(vis, 2 * idx + 1),
            F.element_at(vis, 2 * idx + 2))


def stokes_from_corrs(vis: Column, basis: str = "linear") -> Column:
    """Correlation products -> Stokes parameters, per row: the
    polarization transform every MS consumer applies before imaging
    (Hamaker-Bregman-Sault Measurement Equation convention, public).

    ``vis`` is a 4-correlation interleaved complex array —
    ``[XX, XY, YX, YY]`` for ``basis='linear'``,
    ``[RR, RL, LR, LL]`` for ``basis='circular'`` — and the result is
    ``[I, Q, U, V]`` in the same layout.  Linear feeds:
    I=(XX+YY)/2, Q=(XX-YY)/2, U=(XY+YX)/2, V=(XY-YX)/(2i); circular:
    I=(RR+LL)/2, V=(RR-LL)/2, Q=(RL+LR)/2, U=(RL-LR)/(2i).

    Pure per-row arithmetic in codegen — composes into the scan with
    zero shuffles; :func:`corrs_from_stokes` is the exact inverse
    (roundtrip identity property-tested).  Rows with other than 4
    correlations raise.
    """
    if basis not in ("linear", "circular"):
        raise ValueError(f"stokes_from_corrs: unknown basis {basis!r}")
    v = F.when(F.size(vis) == 8, vis) \
        .when(vis.isNull(), F.lit(None)) \
        .otherwise(F.raise_error(F.lit(
            "stokes_from_corrs: expected 4 interleaved complex "
            "correlations (8 floats)")))
    a_re, a_im = _corr_pair(v, 0)      # XX or RR
    b_re, b_im = _corr_pair(v, 1)      # XY or RL
    c_re, c_im = _corr_pair(v, 2)      # YX or LR
    d_re, d_im = _corr_pair(v, 3)      # YY or LL
    half = F.lit(0.5)
    i_re, i_im = (a_re + d_re) * half, (a_im + d_im) * half
    # (z1 - z2) / (2i) = ((im1 - im2) + i(re2 - re1)) / 2
    sum_bc = ((b_re + c_re) * half, (b_im + c_im) * half)
    dif_bc = ((b_im - c_im) * half, (c_re - b_re) * half)
    dif_ad = ((a_re - d_re) * half, (a_im - d_im) * half)
    if basis == "linear":
        q, u, vv = dif_ad, sum_bc, dif_bc
    else:
        q, u, vv = sum_bc, dif_bc, dif_ad
    return F.when(vis.isNotNull(), F.array(
        i_re, i_im, q[0], q[1], u[0], u[1], vv[0], vv[1]))


def corrs_from_stokes(stokes: Column, basis: str = "linear") -> Column:
    """Stokes -> correlation products (exact inverse of
    :func:`stokes_from_corrs`): linear XX=I+Q, YY=I-Q, XY=U+iV,
    YX=U-iV; circular RR=I+V, LL=I-V, RL=Q+iU, LR=Q-iU."""
    if basis not in ("linear", "circular"):
        raise ValueError(f"corrs_from_stokes: unknown basis {basis!r}")
    s = F.when(F.size(stokes) == 8, stokes) \
        .when(stokes.isNull(), F.lit(None)) \
        .otherwise(F.raise_error(F.lit(
            "corrs_from_stokes: expected [I, Q, U, V] interleaved "
            "(8 floats)")))
    i_re, i_im = _corr_pair(s, 0)
    q_re, q_im = _corr_pair(s, 1)
    u_re, u_im = _corr_pair(s, 2)
    v_re, v_im = _corr_pair(s, 3)
    if basis == "linear":
        # XX=I+Q, XY=U+iV, YX=U-iV, YY=I-Q  (iV = (-v_im, v_re))
        return F.when(stokes.isNotNull(), F.array(
            i_re + q_re, i_im + q_im,
            u_re - v_im, u_im + v_re,
            u_re + v_im, u_im - v_re,
            i_re - q_re, i_im - q_im))
    # RR=I+V, RL=Q+iU, LR=Q-iU, LL=I-V
    return F.when(stokes.isNotNull(), F.array(
        i_re + v_re, i_im + v_im,
        q_re - u_im, q_im + u_re,
        q_re + u_im, q_im - u_re,
        i_re - v_re, i_im - v_im))


def apply_gains_timevar(vis, gains, ant1_col: str = "antenna1",
                        ant2_col: str = "antenna2",
                        data_col: str = "vis",
                        time_col: str = "time",
                        antenna_col: str = "antenna",
                        gain_col: str = "gain",
                        sol_time_col: str = "sol_time",
                        tolerance: float | None = None,
                        out_col: str | None = None):
    """Apply TIME-VARYING antenna gains: each visibility row picks the
    latest gain solution at-or-before its timestamp per antenna (the
    solution-interval semantics of a calibration table), then
    ``corrected = G_p(t) * V * conj(G_q(t))``.

    Composition of two as-of joins (:func:`~dask_ms_spark.operators.
    joins.asof_join` — union+window, no pair blow-up) with the
    diagonal complex correction; rows with no solution inside
    ``tolerance`` get NULL corrected values (flag them downstream).
    The gain table is per-(antenna, interval) — small next to DATA —
    but unlike :func:`apply_gains` the match is temporal, so the plan
    shuffles the FACT table once per as-of join on the antenna key:
    at 100 TB prefer pre-bucketing DATA by (antenna1) or densifying
    solutions to one broadcastable row per (antenna, time-bucket) and
    using a plain broadcast join.
    """
    from ..operators.joins import asof_join

    out_col = out_col or f"{data_col}_corrected"
    gp = gains.select(F.col(antenna_col).alias(ant1_col),
                      F.col(sol_time_col).alias(time_col),
                      F.col(gain_col).alias("__gp"))
    gq = gains.select(F.col(antenna_col).alias(ant2_col),
                      F.col(sol_time_col).alias(time_col),
                      F.col(gain_col).alias("__gq"))
    j = asof_join(vis, gp, on=time_col, by=ant1_col,
                  right_cols=["__gp"], tolerance=tolerance)
    j = asof_join(j, gq, on=time_col, by=ant2_col,
                  right_cols=["__gq"], tolerance=tolerance)
    corrected = F.when(
        F.col("__gp").isNotNull() & F.col("__gq").isNotNull(),
        c_mul(c_mul(F.col("__gp"), F.col(data_col)),
              c_conj(F.col("__gq"))))
    return j.withColumn(out_col, corrected).drop("__gp", "__gq")
