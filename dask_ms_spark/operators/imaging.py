"""Imaging-weight computation — the uv-plane density weighting every
imager applies before gridding (natural / uniform / Briggs robust;
Briggs 1995, "High Fidelity Deconvolution of Moderately Resolved
Sources", ch. 3 — public).  dask-ms hands imagers exactly these
per-row UVW + WEIGHT chunks (reference: daskms/reads.py:58-75); the
weighting itself is the downstream kernel, here as one declarative
plan.

Semantics (matching the standard imager definitions):

* natural: ``w' = w`` (pass-through; the baseline).
* uniform: ``w' = w / W_cell`` (the cell's gridded weight sum — the
  CASA definition and the briggs(R -> -inf) limit) — each occupied
  uv cell contributes equally, killing the dense-core bias at full
  resolution cost.
* briggs(R): ``w' = w / (1 + N_cell * f2)`` with
  ``f2 = (5 * 10^-R)^2 / (sum_cells N_k^2 / sum_i w_i)`` — the robust
  interpolation between natural (R >> 0) and uniform (R << 0).

Scale shape: the cell occupancy ``N_cell`` is a window count over the
(cell_u, cell_v) partition — ONE exchange of (row-key, cell) pairs,
no join back.  The Briggs normalisation is a 1-row global aggregate
broadcast onto the stream (the repo's scalar-broadcast pattern); at
100 TB both are a scan plus tiny shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["imaging_weights", "grid_visibilities", "dirty_image",
           "psf_image", "grid_visibilities_wstack",
           "dirty_image_wstack", "hogbom_clean", "KERNEL_OVERSAMPLE"]

# Oversampling of the tabulated convolution kernel used on the
# quantize_scale (engine-exact) gridding path — samples per cell of
# the 1-D separable kernel table.  128 matches the oversampling range
# production gridders use for their convolution-function tables.
KERNEL_OVERSAMPLE = 128


def imaging_weights(df: DataFrame, u_col: str, v_col: str,
                    cell_size: float, weight_col: str | None = None,
                    mode: str = "uniform",
                    robust: float = 0.0) -> DataFrame:
    """Append ``n_cell`` and ``imaging_weight`` per row.

    ``cell_size`` is the uv-grid cell in the same units as
    ``u_col``/``v_col`` (wavelengths).  Conjugate baselines: grid the
    (u, v) you carry — fold ``(-u, -v)`` onto ``(u, v)`` upstream if
    your convention stores both halves.  ``weight_col`` defaults to
    unit weights.
    """
    if cell_size <= 0:
        raise ValueError(f"imaging_weights: cell_size must be > 0, "
                         f"got {cell_size}")
    if mode not in ("natural", "uniform", "briggs"):
        raise ValueError(f"imaging_weights: unknown mode {mode!r}")
    w = (F.col(weight_col).cast("double") if weight_col
         else F.lit(1.0))
    # nearest cell CENTRE — the same binning grid_visibilities uses,
    # so density weights describe the cells the gridder fills
    cu = F.floor(F.col(u_col).cast("double") / F.lit(float(cell_size))
                 + F.lit(0.5))
    cv = F.floor(F.col(v_col).cast("double") / F.lit(float(cell_size))
                 + F.lit(0.5))
    base = df.withColumn("__cu", cu).withColumn("__cv", cv) \
             .withColumn("__w", w)
    win = (Window.partitionBy("__cu", "__cv")
           .rowsBetween(Window.unboundedPreceding,
                        Window.unboundedFollowing))
    d = base.withColumn("n_cell", F.count(F.lit(1)).over(win))
    if mode == "natural":
        out = d.withColumn("imaging_weight", F.col("__w"))
    elif mode == "uniform":
        # uniform density divides by the gridded WEIGHT sum W_k (the
        # briggs(R -> -inf) limit and the CASA definition), not the
        # row count — counts only coincide under unit weights
        # (review r9)
        out = d.withColumn("imaging_weight",
                           F.col("__w") / F.sum("__w").over(win))
    else:
        # Briggs 1995 / CASA define BOTH the normalisation and the
        # denominator via the gridded WEIGHT sums W_k = sum_i w_i per
        # cell, not row counts: f2 = (5*10^-R)^2 / (sum_k W_k^2 /
        # sum_i w_i) and weight = w / (1 + W_k * f2).  Counts only
        # coincide with W_k under unit weights.  Per-cell stats
        # aggregate from the PRE-window frame so the normalisation
        # branch never pays the window sort, then ONE global 1-row
        # aggregate broadcast back onto the stream.
        cell_stats = (base.groupBy("__cu", "__cv")
                      .agg(F.sum("__w").alias("__wk")))
        g = cell_stats.agg(
            (F.sum(F.col("__wk") * F.col("__wk")).cast("double")
             / F.sum("__wk")).alias("__meanW"))
        # 5 * 10^-R squared, computed once in Python (one double
        # constant crosses into the plan — dyadic-literal rule)
        s2 = float((5.0 * 10.0 ** (-float(robust))) ** 2)
        out = (d.withColumn("__Wk", F.sum("__w").over(win))
               .crossJoin(F.broadcast(g))
               .withColumn("imaging_weight",
                           F.col("__w")
                           / (F.lit(1.0) + F.col("__Wk")
                              * (F.lit(s2) / F.col("__meanW"))))
               .drop("__Wk", "__meanW"))
    return out.drop("__cu", "__cv", "__w")


def grid_visibilities(df: DataFrame, u_col: str, v_col: str,
                      re_col: str, im_col: str, cell_size: float,
                      npix: int, weight_col: str | None = None,
                      hermitian: bool = True,
                      group_cols: list | None = None,
                      kernel_support: int = 0,
                      kernel_sigma: float | None = None,
                      quantize_scale: int | None = None) -> DataFrame:
    """Visibility gridding: scatter weighted (re, im) onto an
    ``npix x npix`` uv grid — the step between dask-ms's per-row
    UVW/DATA chunks (reference: daskms/reads.py:58-75) and the FFT
    imager.

    ``kernel_support=0`` (default) is nearest-cell (cell-box)
    assignment.  ``kernel_support=s > 0`` switches to CONVOLUTIONAL
    gridding with a truncated gaussian kernel: each visibility
    spreads over the ``(2s+1)^2`` cells around its continuous grid
    position, weighted ``exp(-d^2 / (2 sigma^2))`` per axis
    (``kernel_sigma`` in cells, default ``s / 2``; production
    imagers use prolate spheroidals — the gaussian is the standard
    teaching/QA approximation and the PLAN is identical: a FIXED
    map-side neighbour-explode, constant fan-out, on top of the same
    grid-bounded aggregate, so the shuffle still carries at most
    npix^2 cells regardless of visibility volume).

    ``quantize_scale`` (kernel path) applies the repo's fixed-point
    discipline to the per-cell CONTRIBUTIONS (``round(w*k*x *
    scale) / scale``): real-valued kernel weights make the cell sums
    float-addition-order dependent otherwise, and fixed-point
    summands restore shuffle-order determinism (and engine
    mirrorability) exactly as in ``bda_average``/``gain_solve``.

    Cell index: ``iu = floor(u / cell_size + 0.5) + npix // 2``
    (nearest cell centre, engine-portable no-round() spelling;
    likewise iv) — cell iu holds spatial frequency ``(iu - npix/2) *
    cell_size``, the convention ``dirty_image``'s ifftshift assumes.
    Rows falling outside ``[0, npix)`` are dropped (the imager's
    "outside the grid" clip).  ``hermitian=True`` also grids the
    conjugate sample at ``(-u, -v)`` with negated imaginary part —
    the standard fold that makes the dirty image real (with the
    nearest-centre index the conjugate lands on the exact mirror
    cell); it doubles map-side rows but never the shuffle, because
    the aggregate is bounded by the grid.

    Scale shape: ONE groupBy(iu, iv) whose key space is at most
    ``npix^2`` cells — partial (map-side) aggregation collapses each
    task's contribution to <= npix^2 rows regardless of input volume,
    so at 100 TB the exchange carries grid cells, not visibilities.

    Returns (iu, iv, vis_re, vis_im, wsum, n_vis) — the weighted
    cell sums, total cell weight, and occupancy.

    ``group_cols`` grids each group (FIELD_ID, SPW, polarization...)
    independently — one multi-field plan whose aggregate key space
    is ``n_groups * npix^2``; groups are the natural mosaic
    parallelism axis, each feeding its own downstream FFT.
    """
    if cell_size <= 0:
        raise ValueError(f"grid_visibilities: cell_size must be > 0, "
                         f"got {cell_size}")
    if npix <= 0 or npix % 2:
        raise ValueError(f"grid_visibilities: npix must be positive "
                         f"and even, got {npix}")
    if kernel_support < 0:
        raise ValueError(f"grid_visibilities: kernel_support must be "
                         f">= 0, got {kernel_support}")
    gcols = list(group_cols or ())
    w = (F.col(weight_col).cast("double") if weight_col
         else F.lit(1.0))
    half = npix // 2
    u = F.col(u_col).cast("double")
    v = F.col(v_col).cast("double")
    re = F.col(re_col).cast("double")
    im = F.col(im_col).cast("double")
    base = df.select(*gcols, u.alias("__u"), v.alias("__v"),
                     re.alias("__re"), im.alias("__im"),
                     w.alias("__w"))
    if hermitian:
        conj = base.select(*gcols,
                           (-F.col("__u")).alias("__u"),
                           (-F.col("__v")).alias("__v"),
                           F.col("__re").alias("__re"),
                           (-F.col("__im")).alias("__im"),
                           F.col("__w").alias("__w"))
        base = base.unionByName(conj)
    if kernel_support:
        s = int(kernel_support)
        sig = float(kernel_sigma if kernel_sigma is not None
                    else s / 2.0)
        inv2s2 = 1.0 / (2.0 * sig * sig)
        # continuous grid coords; cell j is CENTRED at x = j — the
        # FFT convention dirty_image's ifftshift assumes (cell iu
        # holds spatial frequency (iu - half) * cell_size).  The
        # earlier floor()/centre-j+0.5 spelling represented every
        # off-lattice sample at ~u - cell/2, broke the hermitian
        # mirror pairing, and attenuated the image toward its edge
        # (review r9); floor(x + 0.5) is nearest-cell in the
        # engine-portable no-round() spelling the w-axis already used
        x = F.col("__u") / F.lit(float(cell_size)) + F.lit(half)
        y = F.col("__v") / F.lit(float(cell_size)) + F.lit(half)
        offs = F.array(*[F.lit(i) for i in range(-s, s + 1)])
        spread = (base.withColumn("__x", x).withColumn("__y", y)
                  .withColumn("__du", F.explode(offs))
                  .withColumn("__dv", F.explode(offs)))
        ju = F.floor(F.col("__x") + F.lit(0.5)) + F.col("__du")
        jv = F.floor(F.col("__y") + F.lit(0.5)) + F.col("__dv")
        dx = F.col("__x") - ju.cast("double")
        dy = F.col("__y") - jv.cast("double")
        if quantize_scale:
            # ENGINE-EXACT kernel: runtime exp() is libm-dependent
            # (JVM and other engines disagree by 1 ulp on some
            # arguments, which flips fixed-point roundings that land
            # on a .5 tie — caught by the sf0.1 oracle sweep, one
            # cell in 684).  Production gridders tabulate their
            # convolution functions anyway (casacore/WSClean use
            # oversampled kernel tables); here the separable 1-D
            # gaussian is sampled driver-side at KERNEL_OVERSAMPLE
            # points/cell and linearly interpolated — literals plus
            # exactly-specified IEEE ops only, so ANY engine
            # mirroring the table reproduces k bit-for-bit.
            # Max tabulation error at 128x oversampling is ~3e-5 of
            # peak — far below gridding-kernel fidelity needs.
            import math as _math

            dmax = s + 0.5
            n_tab = int(dmax * KERNEL_OVERSAMPLE) + 2
            tab = [_math.exp(-((i / KERNEL_OVERSAMPLE) ** 2) * inv2s2)
                   for i in range(n_tab + 1)]
            tab_lit = F.array(*[F.lit(t) for t in tab])

            def g1d(d):
                t = F.abs(d) * F.lit(float(KERNEL_OVERSAMPLE))
                i = F.floor(t).cast("int")
                frac = t - i.cast("double")
                lo = F.element_at(tab_lit, i + 1)
                hi = F.element_at(tab_lit, i + 2)
                return lo + frac * (hi - lo)

            k = g1d(dx) * g1d(dy)
        else:
            k = F.exp(-(dx * dx + dy * dy) * F.lit(inv2s2))
        wk = F.col("__w") * k
        if quantize_scale:
            qs = float(quantize_scale)

            def fx(c):
                return F.round(c * F.lit(qs)) / F.lit(qs)

            cells = (spread.select(
                *gcols, ju.alias("iu"), jv.alias("iv"),
                fx(wk * F.col("__re")).alias("__cre"),
                fx(wk * F.col("__im")).alias("__cim"),
                fx(wk).alias("__w"))
                .where((F.col("iu") >= 0) & (F.col("iu") < npix)
                       & (F.col("iv") >= 0) & (F.col("iv") < npix)))
            return cells.groupBy(*gcols, "iu", "iv").agg(
                F.sum("__cre").alias("vis_re"),
                F.sum("__cim").alias("vis_im"),
                F.sum("__w").alias("wsum"),
                F.count(F.lit(1)).alias("n_vis"))
        cells = (spread.select(
            *gcols, ju.alias("iu"), jv.alias("iv"),
            "__re", "__im", wk.alias("__w"))
            .where((F.col("iu") >= 0) & (F.col("iu") < npix)
                   & (F.col("iv") >= 0) & (F.col("iv") < npix)))
    else:
        # nearest CELL CENTRE (floor(x + 0.5)), matching the FFT's
        # cell-iu == frequency (iu - half) * cell_size convention —
        # plain floor() biased every sample half a cell low and made
        # the hermitian fold land conjugates off their mirror cell
        # (review r9)
        cells = base.select(
            *gcols,
            (F.floor(F.col("__u") / F.lit(float(cell_size))
                     + F.lit(0.5)) + F.lit(half)).alias("iu"),
            (F.floor(F.col("__v") / F.lit(float(cell_size))
                     + F.lit(0.5)) + F.lit(half)).alias("iv"),
            "__re", "__im", "__w") \
            .where((F.col("iu") >= 0) & (F.col("iu") < npix)
                   & (F.col("iv") >= 0) & (F.col("iv") < npix))
    return cells.groupBy(*gcols, "iu", "iv").agg(
        F.sum(F.col("__w") * F.col("__re")).alias("vis_re"),
        F.sum(F.col("__w") * F.col("__im")).alias("vis_im"),
        F.sum("__w").alias("wsum"),
        F.count(F.lit(1)).alias("n_vis"))


def dirty_image(grid_df: DataFrame, npix: int,
                iu_col: str = "iu", iv_col: str = "iv",
                re_col: str = "vis_re", im_col: str = "vis_im",
                w_col: str = "wsum"):
    """Inverse-FFT the gridded uv plane into the dirty image
    (numpy ``npix x npix`` float64, normalised by the total gridded
    weight so a 1 Jy point source peaks at ~1).

    The collect here is the documented bounded-aggregate pattern
    (cf. the IVF cell lists, llm/similarity.py): the input is the
    OUTPUT of ``grid_visibilities`` — at most ``npix^2`` rows no
    matter how many visibilities were gridded — so the driver-side
    FFT is O(npix^2 log npix) on aggregate-bounded data, never on
    the corpus.  The distributed work (scan, phase math, grid
    reduction) all happened upstream in one declarative plan.
    """
    import numpy as np

    rows = grid_df.select(iu_col, iv_col, re_col, im_col,
                          w_col).collect()
    grid = np.zeros((npix, npix), dtype=np.complex128)
    wtot = 0.0
    for r in rows:
        iu, iv = int(r[0]), int(r[1])
        if not (0 <= iu < npix and 0 <= iv < npix):
            raise ValueError(f"dirty_image: cell ({iu}, {iv}) outside "
                             f"[0, {npix}) grid")
        grid[iv, iu] += complex(float(r[2]), float(r[3]))
        wtot += float(r[4])
    img = np.fft.fftshift(np.fft.ifft2(np.fft.ifftshift(grid)))
    return (img.real * (npix * npix) / (wtot or 1.0)).astype(np.float64)


def psf_image(grid_df: DataFrame, npix: int,
              iu_col: str = "iu", iv_col: str = "iv",
              w_col: str = "wsum"):
    """Point-spread function: the dirty image of unit visibilities —
    inverse-FFT of the weight-only grid, peak-normalised to 1.  Same
    bounded-collect contract as ``dirty_image``."""
    import numpy as np

    rows = grid_df.select(iu_col, iv_col, w_col).collect()
    grid = np.zeros((npix, npix), dtype=np.complex128)
    for r in rows:
        iu, iv = int(r[0]), int(r[1])
        if not (0 <= iu < npix and 0 <= iv < npix):
            raise ValueError(f"psf_image: cell ({iu}, {iv}) outside "
                             f"[0, {npix}) grid")
        grid[iv, iu] += float(r[2])
    img = np.fft.fftshift(np.fft.ifft2(np.fft.ifftshift(grid))).real
    peak = img.max() if img.max() > 0 else 1.0
    return (img / peak).astype(np.float64)


def grid_visibilities_wstack(df: DataFrame, u_col: str, v_col: str,
                             w_col: str, re_col: str, im_col: str,
                             cell_size: float, npix: int,
                             w_step: float,
                             weight_col: str | None = None,
                             hermitian: bool = True) -> DataFrame:
    """W-stacked gridding: the wide-field (non-coplanar) variant —
    visibilities are binned to their nearest w-plane
    (``iw = floor(w / w_step + 0.5)``, plane centre ``iw * w_step``)
    and gridded per plane; the imager FFTs each plane independently
    and applies the plane's image-space w-phase before summing
    (Offringa et al. 2014, WSClean's w-stacking — public).

    Scale shape: identical to ``grid_visibilities`` with the plane
    index joining the aggregate key — the exchange is bounded by
    ``n_planes * npix^2`` cells, each plane an independent unit of
    downstream FFT work (planes are the natural 1000-executor
    parallelism axis).  The hermitian fold negates w along with
    (u, v), so conjugate planes pair up and the stacked image is
    real.  ``floor(x + 0.5)`` rather than round() keeps plane
    assignment identical across engines.
    """
    if cell_size <= 0:
        raise ValueError(f"grid_visibilities_wstack: cell_size must "
                         f"be > 0, got {cell_size}")
    if npix <= 0 or npix % 2:
        raise ValueError(f"grid_visibilities_wstack: npix must be "
                         f"positive and even, got {npix}")
    if w_step <= 0:
        raise ValueError(f"grid_visibilities_wstack: w_step must be "
                         f"> 0, got {w_step}")
    wt = (F.col(weight_col).cast("double") if weight_col
          else F.lit(1.0))
    half = npix // 2
    base = df.select(F.col(u_col).cast("double").alias("__u"),
                     F.col(v_col).cast("double").alias("__v"),
                     F.col(w_col).cast("double").alias("__w3"),
                     F.col(re_col).cast("double").alias("__re"),
                     F.col(im_col).cast("double").alias("__im"),
                     wt.alias("__wt"))
    if hermitian:
        conj = base.select((-F.col("__u")).alias("__u"),
                           (-F.col("__v")).alias("__v"),
                           (-F.col("__w3")).alias("__w3"),
                           F.col("__re").alias("__re"),
                           (-F.col("__im")).alias("__im"),
                           F.col("__wt").alias("__wt"))
        base = base.unionByName(conj)
    cells = base.select(
        F.floor(F.col("__w3") / F.lit(float(w_step))
                + F.lit(0.5)).alias("iw"),
        (F.floor(F.col("__u") / F.lit(float(cell_size))
                 + F.lit(0.5)) + F.lit(half)).alias("iu"),
        (F.floor(F.col("__v") / F.lit(float(cell_size))
                 + F.lit(0.5)) + F.lit(half)).alias("iv"),
        "__re", "__im", "__wt") \
        .where((F.col("iu") >= 0) & (F.col("iu") < npix)
               & (F.col("iv") >= 0) & (F.col("iv") < npix))
    return cells.groupBy("iw", "iu", "iv").agg(
        F.sum(F.col("__wt") * F.col("__re")).alias("vis_re"),
        F.sum(F.col("__wt") * F.col("__im")).alias("vis_im"),
        F.sum("__wt").alias("wsum"),
        F.count(F.lit(1)).alias("n_vis"))


def dirty_image_wstack(grid_df: DataFrame, npix: int,
                       cell_size: float, w_step: float,
                       iw_col: str = "iw", iu_col: str = "iu",
                       iv_col: str = "iv", re_col: str = "vis_re",
                       im_col: str = "vis_im", w_col: str = "wsum"):
    """Stack the per-plane FFTs into the wide-field dirty image:
    each w-plane grid is inverse-FFT'd, multiplied by its
    image-space correction ``exp(-2 pi i w_c (n(l, m) - 1))`` with
    ``n = sqrt(1 - l^2 - m^2)`` and ``w_c = iw * w_step``, then
    summed; the result is real because hermitian-folded planes come
    in conjugate pairs.  Same bounded-collect contract as
    ``dirty_image`` (input rows <= n_planes * npix^2 by
    construction); pixel (x, y) maps to direction cosines
    ``l = (half - x) / (npix * cell_size)`` (likewise m), matching
    the fftshift convention used throughout.
    """
    import numpy as np

    rows = grid_df.select(iw_col, iu_col, iv_col, re_col, im_col,
                          w_col).collect()
    half = npix // 2
    planes: dict = {}
    wtot = 0.0
    for r in rows:
        iw, iu, iv = int(r[0]), int(r[1]), int(r[2])
        if not (0 <= iu < npix and 0 <= iv < npix):
            raise ValueError(f"dirty_image_wstack: cell ({iu}, {iv}) "
                             f"outside [0, {npix}) grid")
        g = planes.setdefault(iw, np.zeros((npix, npix),
                                           dtype=np.complex128))
        g[iv, iu] += complex(float(r[3]), float(r[4]))
        wtot += float(r[5])
    xs = np.arange(npix)
    lgrid = (half - xs)[None, :] / (npix * cell_size)   # l along x
    mgrid = (half - xs)[:, None] / (npix * cell_size)   # m along y
    nsq = 1.0 - lgrid ** 2 - mgrid ** 2
    n1 = np.sqrt(np.clip(nsq, 0.0, None)) - 1.0         # n - 1
    acc = np.zeros((npix, npix), dtype=np.complex128)
    for iw, g in planes.items():
        img = np.fft.fftshift(np.fft.ifft2(np.fft.ifftshift(g)))
        acc += img * np.exp(-2j * np.pi * (iw * w_step) * n1)
    return (acc.real * (npix * npix) / (wtot or 1.0)).astype(np.float64)


def hogbom_clean(dirty, psf, gain: float = 0.1,
                 threshold: float = 0.0, max_iter: int = 200):
    """Hogbom CLEAN deconvolution (Hogbom 1974 — public): iterative
    peak-find / shifted-PSF-subtract on the dirty image, the
    classical closing step of the grid -> FFT -> deconvolve imaging
    chain.

    Pure numpy on the npix^2-bounded images produced by
    ``dirty_image`` / ``psf_image`` — by the bounded-aggregate
    contract this is driver-side work on data whose size is fixed by
    the grid, never by the visibility volume; the distributed plan
    ends at the gridder.  Returns ``(components, residual)`` where
    ``components`` is a list of ``(y, x, flux)`` CLEAN components
    (repeat hits on one pixel are merged) and ``residual`` is the
    remaining dirty image.

    Stops when the absolute peak drops to ``threshold``, after
    ``max_iter`` minor cycles, or — the divergence guard — when the
    residual peak grows past 1.5x the best peak achieved (degenerate
    uv coverage can put PSF grating lobes at ~1, where naive CLEAN
    amplifies instead of converging; transient few-percent wiggles
    from sidelobe interplay are normal and pass through).
    ``psf`` must be peak-normalised (``psf_image`` output);
    subtraction uses the overlapping window of the PSF shifted to
    the peak.
    """
    import numpy as np

    if not (0.0 < gain <= 1.0):
        raise ValueError(f"hogbom_clean: gain must be in (0, 1], "
                         f"got {gain}")
    if max_iter <= 0:
        raise ValueError(f"hogbom_clean: max_iter must be > 0, "
                         f"got {max_iter}")
    res = np.array(dirty, dtype=np.float64, copy=True)
    psf = np.asarray(psf, dtype=np.float64)
    if res.shape != psf.shape:
        raise ValueError(f"hogbom_clean: dirty {res.shape} and psf "
                         f"{psf.shape} shapes differ")
    npy, npx = res.shape
    cy, cx = np.unravel_index(psf.argmax(), psf.shape)
    comps: dict = {}
    best_peak = float("inf")
    for _ in range(max_iter):
        iy, ix = np.unravel_index(np.abs(res).argmax(), res.shape)
        peak = res[iy, ix]
        if abs(peak) <= threshold or abs(peak) > 1.5 * best_peak:
            break
        best_peak = min(best_peak, abs(peak))
        frac = gain * peak
        comps[(iy, ix)] = comps.get((iy, ix), 0.0) + frac
        # overlap window of the PSF translated so (cy, cx) -> (iy, ix)
        dy, dx = iy - cy, ix - cx
        y0, y1 = max(0, dy), min(npy, npy + dy)
        x0, x1 = max(0, dx), min(npx, npx + dx)
        res[y0:y1, x0:x1] -= frac * psf[y0 - dy:y1 - dy,
                                        x0 - dx:x1 - dx]
    components = [(y, x, flux)
                  for (y, x), flux in sorted(comps.items())]
    return components, res
