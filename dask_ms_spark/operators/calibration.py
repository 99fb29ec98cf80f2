"""Antenna-gain calibration solve — the "antsol" fixed-point
iteration that produces the gain tables ``functions/complexf.py
apply_gains`` consumes (reference context: dask-ms feeds calibration
packages exactly these per-baseline DATA chunks,
daskms/reads.py:58-75; the solve itself is the downstream kernel).

Model: ``V_pq = g_p * conj(g_q) * M_pq`` with a unit point-source
model (M = 1).  Each iteration estimates

    g_p  <-  sum_q V_pq * g_q  /  sum_q |g_q|^2

(over both edge directions, ``V_qp = conj(V_pq)``), then applies a
damped update ``g <- (1 - damping) * g + damping * g_new`` — the
classic stabilised antsol step.

Scale shape: the gain table is per-ANTENNA (dozens to thousands of
rows — always broadcast-sized), so each iteration is a broadcast join
of gains onto the edge list plus ONE antenna-keyed aggregation of the
visibility-sized edge set; ``iters`` is a small constant.  Sums are
int64-quantised (the kmeans/pagerank fixed-point discipline), so the
solve is bit-deterministic under any shuffle order and mirrors
engine-exactly in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from dask_ms_spark.functions.vector import _bind_once

__all__ = ["gain_solve", "bandpass_solve", "delay_fit", "unwrap_phases",
           "closure_phases", "closure_amplitudes", "predict_vis",
           "uvw_from_baseline", "noise_estimate", "statwt"]


def _qsum(c, scale: float):
    return (F.sum(F.round(c * F.lit(scale)).cast("long")).cast("double")
            / F.lit(scale))


def gain_solve(vis: DataFrame, ant1_col: str = "antenna1",
               ant2_col: str = "antenna2", vis_col: str = "vis",
               iters: int = 2, damping: float = 0.5,
               quantize_scale: int = 1 << 20,
               extra_keys: list | tuple = ()) -> DataFrame:
    """Solve per-antenna complex gains from baseline visibilities.

    ``vis_col`` is an interleaved complex scalar ``[re, im]`` (one
    correlation, one channel — average first with
    :func:`~dask_ms_spark.operators.bda.bda_average` /
    ``masked_bin_average`` for multi-channel data).  Multiple rows per
    baseline are fine: they all enter the per-antenna sums.  Rows
    with ``ant1 == ant2`` (autocorrelations) are excluded — they
    carry no cross-gain information in this model.

    Returns (antenna, gain) with ``gain = [re, im]``.  The overall
    phase is unconstrained (the usual gauge freedom); reference the
    phases to one antenna downstream if absolute phase matters.

    ``extra_keys`` solves an INDEPENDENT gain per extra key value —
    the generalisation :func:`bandpass_solve` uses for per-channel
    gains; the gain table stays (keys x antennas)-sized, so the
    per-iteration attach remains a broadcast.
    """
    if iters < 1:
        raise ValueError(f"gain_solve: iters must be >= 1, got {iters}")
    if not 0 < damping <= 1:
        raise ValueError(f"gain_solve: damping must be in (0, 1], "
                         f"got {damping}")
    qs = float(quantize_scale)
    keys = [str(k) for k in extra_keys]
    kcols = [F.col(k) for k in keys]
    p, q = F.col(ant1_col), F.col(ant2_col)
    vre = F.element_at(F.col(vis_col), 1).cast("double")
    vim = F.element_at(F.col(vis_col), 2).cast("double")
    fwd = vis.where(p != q).select(*kcols, p.alias("p"), q.alias("q"),
                                   vre.alias("vre"), vim.alias("vim"))
    rev = vis.where(p != q).select(*kcols, q.alias("p"), p.alias("q"),
                                   vre.alias("vre"),
                                   (-vim).alias("vim"))
    edges = fwd.unionByName(rev)

    gains = (edges.select(*keys, F.col("p").alias("antenna"))
             .distinct()
             .select(*keys, "antenna", F.lit(1.0).alias("gre"),
                     F.lit(0.0).alias("gim")))
    d = float(damping)
    for _ in range(iters):
        j = edges.join(F.broadcast(gains.select(
            *keys, F.col("antenna").alias("q"),
            F.col("gre").alias("qre"), F.col("gim").alias("qim"))),
            on=keys + ["q"])
        num_re = F.col("vre") * F.col("qre") - F.col("vim") * F.col("qim")
        num_im = F.col("vre") * F.col("qim") + F.col("vim") * F.col("qre")
        den = F.col("qre") * F.col("qre") + F.col("qim") * F.col("qim")
        est = (j.groupBy(*keys, F.col("p").alias("antenna"))
               .agg(_qsum(num_re, qs).alias("sre"),
                    _qsum(num_im, qs).alias("sim"),
                    _qsum(den, qs).alias("sd")))
        gains = (gains.join(est, on=keys + ["antenna"])
                 .select(*keys, "antenna",
                         (F.lit(1 - d) * F.col("gre")
                          + F.lit(d) * F.col("sre") / F.col("sd"))
                         .alias("gre"),
                         (F.lit(1 - d) * F.col("gim")
                          + F.lit(d) * F.col("sim") / F.col("sd"))
                         .alias("gim")))
        # the gain table is tiny; checkpointing truncates the lineage
        # so each iteration's plan stays iteration-sized.  r13
        # examined and REJECTED a collect + createDataFrame
        # truncation (A/B: gain_solve 1.70x, bandpass 1.46x,
        # applycal 1.30x SLOWER): the collect materialises every
        # iteration synchronously through the driver, while the
        # checkpoint's result stage stays lazy until the next
        # iteration's job needs it.
        gains = gains.localCheckpoint(eager=False)
    return gains.select(*keys, "antenna",
                        F.array("gre", "gim").alias("gain"))


def bandpass_solve(vis: DataFrame, chan_col: str = "chan",
                   ant1_col: str = "antenna1",
                   ant2_col: str = "antenna2", vis_col: str = "vis",
                   iters: int = 2, damping: float = 0.5,
                   quantize_scale: int = 1 << 20) -> DataFrame:
    """Per-channel antenna gains — the CASA ``bandpass`` task shape:
    each channel solves its own antsol system independently (the
    frequency response of each antenna's signal chain).  One
    ``gain_solve`` with the channel as an extra key: the edge set is
    visibility-sized but shuffles once per iteration on
    (chan, antenna); the gain table is (n_chan x n_ant) rows —
    still broadcast-sized for any real array.  Returns
    (chan, antenna, gain)."""
    return gain_solve(vis, ant1_col, ant2_col, vis_col, iters,
                      damping, quantize_scale,
                      extra_keys=[chan_col])


def unwrap_phases(phases, max_width: int = 1 << 14) -> Column:
    """Unwrap a phase array (numpy.unwrap semantics): each element is
    shifted by the multiple of 2*pi that keeps it within pi of its
    unwrapped predecessor.

    Linearithmic spelling (r11): the per-step correction depends only
    on the RAW consecutive difference — ``k_i = round((p_i -
    p_{i-1}) / 2pi)`` — because the fold's unwrapped predecessor
    differs from the raw one by an exact integer multiple of 2*pi
    that commutes through ``round``.  So the unwrap is ``p_i - 2pi *
    cumsum(k)_i``: one ``zip_with`` for the diffs, one
    :func:`~dask_ms_spark.functions.vector.prefix_sum` scan (O(n log
    max_width)), one ``zip_with`` to apply — replacing the original
    fold-and-``concat`` array build, whose per-step copy made it
    O(n^2) (measured 3.2x wall going 4k -> 8k channels).  At an
    EXACT half-period tie (|diff| == pi) the rounded value follows
    round-half-away-from-zero of the raw diff — measure-zero on
    instrument phases, same tie caveat as the repo's other
    engine-parity notes.
    """
    import math

    from dask_ms_spark.functions.vector import prefix_sum

    two_pi = F.lit(2.0 * math.pi)

    def run(p):
        n = F.size(p)
        # prev_i = p_{i-1}, with prev_1 = p_1 (zero first diff)
        prev = F.slice(F.concat(F.array(F.get(p, 0)), p), 1, n)
        ks = F.zip_with(p, prev,
                        lambda a, b: F.round((a - b) / two_pi))
        return F.zip_with(p, prefix_sum(ks, max_width),
                          lambda a, k: a - two_pi * k)

    return _bind_once(run, p=F.transform(phases,
                                         lambda x: x.cast("double")))


def delay_fit(df: DataFrame, vis_col: str, freqs_hz: list,
              out_col: str = "delay_fit") -> DataFrame:
    """Per-row delay (fringe) fit: the least-squares slope of the
    UNWRAPPED visibility phase across frequency — the calibration
    step after :func:`gain_solve` (a residual delay tau makes phase
    climb linearly as 2*pi*f*tau; fitting and removing it is
    "fringe fitting lite").

    ``vis_col`` is interleaved complex per channel (2*len(freqs_hz)
    doubles); frequencies are driver constants, so their moments fold
    to literals and the whole fit — atan2 phases, fold-based unwrap,
    least-squares sums — is ONE map-side codegen expression: no
    explode, no shuffle, no Python.  Returns a struct
    ``(delay_s, phase0, n_chan)`` with ``delay_s = slope / (2*pi)``
    (seconds for Hz inputs) and ``phase0`` the fitted intercept at
    f=0.  Rows whose channel count disagrees with ``freqs_hz`` raise.

    Pytest-only oracle (numpy.unwrap + polyfit): the sequential
    unwrap state makes a static SQL mirror inexpressible, same class
    as learn_bpe_merges.
    """
    import math

    n = len(freqs_hz)
    if n < 2:
        raise ValueError("delay_fit: need at least 2 channels")
    v = F.when(F.size(vis_col) == 2 * n, F.col(vis_col)) \
        .otherwise(F.raise_error(F.lit(
            "delay_fit: vis length disagrees with freqs_hz")))
    idx = F.sequence(F.lit(0), F.lit(n - 1))
    phases = F.transform(idx, lambda i: F.atan2(
        F.element_at(v, 2 * i + 2), F.element_at(v, 2 * i + 1)))
    w = unwrap_phases(phases)

    xs = [float(f) for f in freqs_hz]
    sx = float(sum(xs))
    sxx = float(sum(x * x for x in xs))
    x_arr = F.array(*[F.lit(x) for x in xs])
    denom = n * sxx - sx * sx
    if denom == 0:
        raise ValueError("delay_fit: degenerate (constant) freqs_hz")
    # bind the unwrapped array ONCE per row: sy/sxy both fold over it
    # and slope/phase0 reference those sums several times — inlined,
    # the sequential unwrap fold would re-evaluate ~5x per row (the
    # spectral_moments bind-once form, review r9)
    bound = F.array(F.struct(w.alias("w")))

    def final(p):
        sy = F.aggregate(p["w"], F.lit(0.0), lambda a, y: a + y)
        sxy = F.aggregate(F.zip_with(p["w"], x_arr,
                                     lambda y, x: y * x),
                          F.lit(0.0), lambda a, t: a + t)
        slope = (F.lit(float(n)) * sxy - F.lit(sx) * sy) / F.lit(denom)
        phase0 = (sy - slope * F.lit(sx)) / F.lit(float(n))
        return F.struct(
            (slope / F.lit(2.0 * math.pi)).alias("delay_s"),
            phase0.alias("phase0"),
            F.lit(n).cast("long").alias("n_chan"))

    return df.withColumn(
        out_col, F.element_at(F.transform(bound, final), 1))


def noise_estimate(vis: DataFrame, time_col: str,
                   baseline_cols: list, vis_col: str,
                   quantize_scale: int = 1 << 20) -> DataFrame:
    """Successive-difference thermal-noise estimator per baseline —
    the QA staple (used by wsclean/CASA sensitivity reporting):

        sigma^2 = mean over cells of |V(t) - V(t-1)|^2 / 2

    Differencing adjacent integrations cancels the slowly-varying sky
    signal and doubles the noise variance, so the estimator reads the
    thermal noise even on-source.  ``vis_col`` is an interleaved
    complex array; summing squared differences over the interleaved
    positions IS the |.|^2 sum, each component difference carries
    variance 2 sigma^2, so with n interleaved terms
    ``sigma = sqrt(ssq / n / 2)`` (sigma is the per-component noise,
    the MS SIGMA convention).

    Scale shape: positions explode once; ONE window lag keyed
    (baseline, position) ordered by time; ONE baseline-keyed
    aggregation of int64-quantised squared differences (fixed-point
    discipline: shuffle-order deterministic, engine-mirrorable).
    Returns (baseline_cols..., n_diff_terms, sigma).
    """
    baseline_cols = list(baseline_cols)
    qs = float(quantize_scale)
    ex = vis.select(*baseline_cols,
                    F.col(time_col).alias("__t"),
                    F.posexplode(F.col(vis_col)).alias("__pos", "__x"))
    from pyspark.sql import Window

    w = Window.partitionBy(*baseline_cols, "__pos").orderBy("__t")
    d = F.col("__x").cast("double") - F.lag(F.col("__x").cast("double")
                                            ).over(w)
    terms = ex.withColumn("__dsq", F.round(d * d * F.lit(qs))
                          .cast("long"))
    return (terms.where(F.col("__dsq").isNotNull())
            .groupBy(*baseline_cols)
            .agg(F.count(F.lit(1)).alias("n_diff_terms"),
                 (F.sqrt(F.sum("__dsq").cast("double") / F.lit(qs)
                         / F.count(F.lit(1)) / F.lit(2.0)))
                 .alias("sigma")))


def statwt(vis: DataFrame, time_col: str, baseline_cols: list,
           vis_col: str, weight_floor: float = 0.0,
           quantize_scale: int = 1 << 20) -> DataFrame:
    """Re-derive per-row WEIGHT/SIGMA from the data's own scatter —
    the CASA ``statwt`` task (public docs; reference context: dask-ms
    ships exactly these per-baseline DATA/WEIGHT chunks to such
    tasks, daskms/reads.py:58-75).  The a-priori WEIGHT column an MS
    arrives with reflects nominal SEFDs; after calibration the honest
    weight is the inverse variance of the residual visibilities,
    which the successive-difference estimator reads directly
    (``noise_estimate`` above): ``sigma_b`` per baseline, then every
    row of baseline b gets ``SIGMA = sigma_b`` and
    ``WEIGHT = 1 / sigma_b^2``.

    ``weight_floor`` clamps pathologically quiet baselines (sigma
    underflow -> weight blow-up) the way CASA's wtrange bound does:
    weights above ``1/weight_floor^2`` clamp when a positive floor is
    given.

    Scale shape: the sigma table is per-BASELINE (n_ant^2 rows —
    always broadcast-sized), so the re-weight is ONE broadcast join
    onto the visibility-sized frame after the ``noise_estimate``
    pass (one window lag + one agg); no corpus-sized shuffle beyond
    the estimator's own.  Input rows pass through unchanged plus
    (n_diff_terms, sigma, weight).
    """
    baseline_cols = list(baseline_cols)
    sig = noise_estimate(vis, time_col, baseline_cols, vis_col,
                         quantize_scale=quantize_scale)
    s = F.col("sigma")
    if weight_floor > 0:
        s = F.greatest(s, F.lit(float(weight_floor)))
    # report the CLAMPED sigma alongside the weight it produced —
    # the MS invariant is WEIGHT == 1/SIGMA^2, and an unclamped
    # sigma next to a clamped weight disagreed by (sigma/floor)^2
    # on quiet baselines (review r9)
    sig = sig.select(*baseline_cols, "n_diff_terms",
                     s.alias("sigma"),
                     (F.lit(1.0) / (s * s)).alias("weight"))
    return vis.join(F.broadcast(sig), on=baseline_cols, how="left")


def closure_phases(vis: DataFrame, ant1_col: str = "antenna1",
                   ant2_col: str = "antenna2",
                   vis_col: str = "vis") -> DataFrame:
    """Closure phase per antenna triangle:
    ``arg(V_pq * V_qr * conj(V_pr))`` for every p < q < r — the
    classic gain-INDEPENDENT interferometry diagnostic (antenna gain
    phases cancel around the triangle, so a non-zero closure phase is
    a real instrumental/sky signature, not calibration error).

    Input: one row per baseline (p < q) with ``vis_col = [re, im]``
    (pre-average multiple samples per baseline first).  The join
    graph is baseline x baseline x baseline keyed on the SHARED
    antenna — baselines number O(n_antennas^2) (a dimension table
    next to the visibility fact table at any scale), so all three
    legs broadcast and the triangle enumeration never shuffles a
    fact-sized relation.  Returns (p, q, r, closure_phase) in
    radians, one row per triangle.
    """
    b = vis.select(F.col(ant1_col).alias("p"),
                   F.col(ant2_col).alias("q"),
                   F.element_at(F.col(vis_col), 1).cast("double")
                   .alias("re"),
                   F.element_at(F.col(vis_col), 2).cast("double")
                   .alias("im")) \
        .where(F.col("p") < F.col("q"))
    pq = b.select(F.col("p"), F.col("q"),
                  F.col("re").alias("re1"), F.col("im").alias("im1"))
    qr = b.select(F.col("p").alias("q"), F.col("q").alias("r"),
                  F.col("re").alias("re2"), F.col("im").alias("im2"))
    pr = b.select(F.col("p").alias("p2"), F.col("q").alias("r2"),
                  F.col("re").alias("re3"), F.col("im").alias("im3"))
    tri = (pq.join(F.broadcast(qr), on="q")
           .join(F.broadcast(pr),
                 (F.col("p") == F.col("p2"))
                 & (F.col("r") == F.col("r2"))))
    # (V1 * V2) * conj(V3)
    ab_re = F.col("re1") * F.col("re2") - F.col("im1") * F.col("im2")
    ab_im = F.col("re1") * F.col("im2") + F.col("im1") * F.col("re2")
    c_re = ab_re * F.col("re3") + ab_im * F.col("im3")
    c_im = ab_im * F.col("re3") - ab_re * F.col("im3")
    return tri.select("p", "q", "r",
                      F.atan2(c_im, c_re).alias("closure_phase"))


def closure_amplitudes(vis: DataFrame, ant1_col: str = "antenna1",
                       ant2_col: str = "antenna2",
                       vis_col: str = "vis") -> DataFrame:
    """Closure amplitude per antenna quadrangle:
    ``|V_pq| |V_rs| / (|V_pr| |V_qs|)`` for every p < q < r < s — the
    gain-AMPLITUDE-independent companion to :func:`closure_phases`
    (each antenna's gain magnitude appears once in the numerator and
    once in the denominator, so it cancels; VLBI's standard
    amplitude-calibration-free observable).

    Input: one row per baseline (p < q) with ``vis_col = [re, im]``
    (pre-average multiple samples per baseline first).  Same scale
    shape as the triangle enumeration: baselines are O(n_antennas^2)
    — a dimension table — so all four join legs broadcast and
    nothing fact-sized shuffles.  Quadrangles with a zero
    denominator baseline (|V_pr| or |V_qs| = 0) return NULL rather
    than inf.  Returns (p, q, r, s, closure_amp).
    """
    mag = F.sqrt(
        F.element_at(F.col(vis_col), 1).cast("double")
        * F.element_at(F.col(vis_col), 1).cast("double")
        + F.element_at(F.col(vis_col), 2).cast("double")
        * F.element_at(F.col(vis_col), 2).cast("double"))
    b = vis.select(F.col(ant1_col).alias("p"),
                   F.col(ant2_col).alias("q"),
                   mag.alias("m")) \
        .where(F.col("p") < F.col("q"))
    pq = b.select("p", "q", F.col("m").alias("m_pq"))
    rs = b.select(F.col("p").alias("r"), F.col("q").alias("s"),
                  F.col("m").alias("m_rs"))
    pr = b.select(F.col("p").alias("p3"), F.col("q").alias("r3"),
                  F.col("m").alias("m_pr"))
    qs = b.select(F.col("p").alias("q4"), F.col("q").alias("s4"),
                  F.col("m").alias("m_qs"))
    quad = (pq.join(F.broadcast(rs), F.col("r") > F.col("q"))
            .join(F.broadcast(pr),
                  (F.col("p3") == F.col("p"))
                  & (F.col("r3") == F.col("r")))
            .join(F.broadcast(qs),
                  (F.col("q4") == F.col("q"))
                  & (F.col("s4") == F.col("s"))))
    den = F.col("m_pr") * F.col("m_qs")
    amp = F.when(den > 0,
                 (F.col("m_pq") * F.col("m_rs")) / den)
    return quad.select("p", "q", "r", "s", amp.alias("closure_amp"))


def predict_vis(df: DataFrame, u_col: str, v_col: str,
                sources: list, out_col: str = "model_vis",
                w_col: str | None = None) -> DataFrame:
    """Predict model visibilities for a point-source list: the
    gridless forward model ``V(u, v) = sum_k flux_k *
    exp(2*pi*i*(u*l_k + v*m_k))`` — what a calibration loop compares
    DATA against (the M in the measurement equation).

    ``sources`` is a driver-side list of ``(flux, l, m)`` with (l, m)
    the direction cosines in the same units that make ``u*l``
    dimensionless (u, v in wavelengths; l, m in radians for small
    fields).  Sources bake into the plan as literals, so prediction
    is a pure map over the scan — zero shuffles, and the per-source
    terms accumulate in a fixed order (engine-portable).  Returns
    ``out_col = [re, im]``.

    ``w_col`` enables the wide-field w-term: the phase gains
    ``w * (n_k - 1)`` with ``n_k = sqrt(1 - l_k^2 - m_k^2)`` — the
    exact non-coplanar measurement equation (Cornwell et al. 2008,
    w-projection; public).  ``n_k`` is computed driver-side per
    source, so the w path stays a pure literal-baked map.
    """
    import math

    if not sources:
        raise ValueError("predict_vis: empty source list")
    u = F.col(u_col).cast("double")
    v = F.col(v_col).cast("double")
    w = F.col(w_col).cast("double") if w_col else None
    two_pi = 2.0 * math.pi
    # FT of a unit elliptical Gaussian with sky FWHM (maj, min) at
    # position angle pa (north through east): a Gaussian envelope in
    # (u, v) with exponent -pi^2/(4 ln 2) [maj^2 ur^2 + min^2 vr^2],
    # ur along the major axis = u sin(pa) + v cos(pa) (the standard
    # component-model convention, e.g. wsclean source lists; public)
    g_k = -(math.pi ** 2) / (4.0 * math.log(2.0))
    re, im = F.lit(0.0), F.lit(0.0)
    for src in sources:
        if len(src) == 3:
            flux, l, m = src
            env = F.lit(1.0)
        elif len(src) == 6:
            flux, l, m, maj, mnr, pa = src
            sp, cp = math.sin(float(pa)), math.cos(float(pa))
            ur = u * F.lit(sp) + v * F.lit(cp)
            vr = u * F.lit(cp) - v * F.lit(sp)
            env = F.exp(F.lit(g_k) * (
                F.lit(float(maj) ** 2) * ur * ur
                + F.lit(float(mnr) ** 2) * vr * vr))
        else:
            raise ValueError(
                "predict_vis: sources are (flux, l, m) points or "
                "(flux, l, m, fwhm_maj, fwhm_min, pa) Gaussians, "
                f"got a {len(src)}-tuple")
        ph = u * F.lit(float(l)) + v * F.lit(float(m))
        if w is not None:
            n1 = math.sqrt(1.0 - float(l) ** 2 - float(m) ** 2) - 1.0
            ph = ph + w * F.lit(n1)
        ph = F.lit(two_pi) * ph
        re = re + F.lit(float(flux)) * env * F.cos(ph)
        im = im + F.lit(float(flux)) * env * F.sin(ph)
    return df.withColumn(out_col, F.array(re, im))


def uvw_from_baseline(df: DataFrame, bx_col: str, by_col: str,
                      bz_col: str, ha_col: str, dec: float,
                      wavelength: float = 1.0) -> DataFrame:
    """Synthesis-array geometry: rotate equatorial baseline vectors
    (bx, by, bz) into (u, v, w) for a phase centre at declination
    ``dec`` (radians) and per-row hour angle ``ha_col`` (radians) —
    the standard transform (Thompson, Moran & Swenson eq. 4.1;
    public), what casacore's MSDerivedValues computes for the UVW
    column the reference reads (daskms/reads.py:58-75):

        u =  sin(H) bx + cos(H) by
        v = -sin(d) cos(H) bx + sin(d) sin(H) by + cos(d) bz
        w =  cos(d) cos(H) bx - cos(d) sin(H) by + sin(d) bz

    divided by ``wavelength`` to express u, v, w in wavelengths.
    Pure map over the scan — the declination terms bake in as
    literals, zero shuffles.
    """
    import math

    if wavelength <= 0:
        raise ValueError(f"uvw_from_baseline: wavelength must be "
                         f"> 0, got {wavelength}")
    sd, cd = math.sin(float(dec)), math.cos(float(dec))
    bx = F.col(bx_col).cast("double")
    by = F.col(by_col).cast("double")
    bz = F.col(bz_col).cast("double")
    sh, ch = F.sin(F.col(ha_col).cast("double")), \
        F.cos(F.col(ha_col).cast("double"))
    inv = F.lit(1.0 / float(wavelength))
    return df.withColumns({
        "u": (sh * bx + ch * by) * inv,
        "v": (F.lit(-sd) * ch * bx + F.lit(sd) * sh * by
              + F.lit(cd) * bz) * inv,
        "w": (F.lit(cd) * ch * bx - F.lit(cd) * sh * by
              + F.lit(sd) * bz) * inv,
    })
