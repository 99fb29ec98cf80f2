"""End-to-end MS pipeline composition (r8 verdict item 5).

Chains the real workflow the reference's users run — read MS store →
``taql_where`` flag filter → ``rfi_flag`` → ``gain_solve``/
``apply_gains`` → ``bda_average`` → ``imaging_weights`` →
``grid_visibilities`` → ``dirty_image`` — as ONE lazy plan at sf0.1,
asserting (a) the image matches the stepwise-materialised run
bit-exactly and (b) the composed plan carries no CartesianProduct /
BatchEvalPython / unpartitioned windows.  The reference's analogue is
the chained examples (/root/reference/examples/ms_subtable_join.py,
docs/tutorial); here the whole chain is one Catalyst plan.

Bit-exactness across plan shapes relies on the repo's fixed-point
discipline: every cross-row SUM in the chain (gain iterations, BDA
tensor means, grid cell sums) is over 2^-20-quantised doubles, so the
additions are exact and shuffle-order-independent; the synthetic
weights are dyadic (multiples of 0.25) for the same reason.
"""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"


def _write_synth_ms(spark, store: str) -> None:
    """A single-channel MS main table derived from the embeddings
    table: per-baseline constant (U, V), forward-modelled DATA
    ``V_pq = G_p * s * conj(G_q)``, a 64-point SPECTRUM for the RFI
    stage, and pre-flags on extreme spectrum values."""
    embs = spark.read.parquet(os.path.join(SF_DIR,
                                           "embeddings.parquet"))
    a1 = (F.col("vec_id") % 8).cast("long")
    a2 = ((F.col("vec_id") / 8).cast("long") % 8)
    a1d, a2d = a1.cast("double"), a2.cast("double")
    gp_re, gp_im = 1.0 + 0.05 * a1d, 0.02 * a1d
    gq_re, gq_im = 1.0 + 0.05 * a2d, 0.02 * a2d
    s = 1.0 + 0.001 * (F.col("vec_id") % 7).cast("double")
    vre = (gp_re * gq_re + gp_im * gq_im) * s
    vim = (gp_im * gq_re - gp_re * gq_im) * s
    u = (a1d * 8 + a2d) * 5.0 - 150.0
    v = (a2d * 3 - a1d * 2) * 7.0 - 40.0
    (embs.select(
        a1.alias("ANTENNA1"), a2.alias("ANTENNA2"),
        F.col("vec_id").cast("double").alias("TIME"),
        u.alias("U"), v.alias("V"),
        F.sqrt(u * u + v * v).alias("UVDIST"),
        F.array(vre, vim).alias("DATA"),
        F.transform("embedding", lambda x: x.cast("double"))
         .alias("SPECTRUM"),
        F.transform("embedding", lambda x: x <= F.lit(-1.5))
         .alias("FLAG"),
        (1.0 + (F.col("vec_id") % 5).cast("double") * 0.25)
         .alias("WEIGHT"))
     .write.parquet(store))


def _chain(spark, store: str, materialize=None):
    """The full pipeline; ``materialize`` round-trips each stage
    through parquet (the stepwise leg) or is None (one lazy plan)."""
    from dask_ms_spark.functions.complexf import apply_gains
    from dask_ms_spark.operators.bda import bda_average
    from dask_ms_spark.operators.calibration import gain_solve
    from dask_ms_spark.operators.imaging import (grid_visibilities,
                                                 imaging_weights)
    from dask_ms_spark.operators.rfi import rfi_flag
    from dask_ms_spark.sources.storage import xds_from_storage_table

    m = materialize or (lambda df, name: df)

    [ds] = xds_from_storage_table(
        spark, store,
        taql_where="ANTENNA1 != ANTENNA2 && !ALL(FLAG)")
    vis = ds.df

    # RFI stage: flag per spectrum cell, keep rows <= half flagged
    verdicts = rfi_flag(
        vis.select("ANTENNA1", "ANTENNA2", "TIME", "SPECTRUM", "FLAG"),
        "TIME", ["ANTENNA1", "ANTENNA2"], "SPECTRUM", "FLAG",
        window=3, k=4.0)
    verdicts = m(verdicts, "rfi")
    keep = verdicts.select(
        "ANTENNA1", "ANTENNA2", "TIME",
        (F.size(F.filter("flag_rfi", lambda x: x)) * 2
         <= F.size("flag_rfi")).alias("__ok"))
    vis2 = (vis.join(keep, ["ANTENNA1", "ANTENNA2", "TIME"])
               .where("__ok").drop("__ok"))
    vis2 = m(vis2, "vis2")

    # calibration: solve then correct (applycal direction)
    gains = gain_solve(vis2, "ANTENNA1", "ANTENNA2", "DATA", iters=2)
    gains = m(gains, "gains")
    corr = apply_gains(vis2, gains, ant1_col="ANTENNA1",
                       ant2_col="ANTENNA2", data_col="DATA",
                       mode="correct")
    corr = m(corr, "corr")

    # BDA: adaptive time bins per baseline, quantised tensor mean
    avg = bda_average(
        corr.withColumn("__fl2", F.array(F.lit(False), F.lit(False))),
        "TIME", ["ANTENNA1", "ANTENNA2"], "UVDIST",
        base_interval=64.0, ref_uvdist=150.0,
        data_col="DATA_corrected", flag_col="__fl2",
        weight_col="WEIGHT", quantize_scale=1 << 20)
    avg = m(avg, "avg")

    # re-attach the per-baseline (U, V) — dimension-sized broadcast
    uvlut = vis.select("ANTENNA1", "ANTENNA2", "U", "V").distinct()
    binned = avg.join(F.broadcast(uvlut), ["ANTENNA1", "ANTENNA2"])
    iw = imaging_weights(binned, "U", "V", cell_size=20.0,
                         weight_col="weight_sum", mode="uniform")
    iw = m(iw, "iw")

    grid = grid_visibilities(
        iw.where(~F.element_at("flag", 1))
          .withColumn("re", F.element_at("data_mean", 1))
          .withColumn("im", F.element_at("data_mean", 2)),
        "U", "V", "re", "im", cell_size=20.0, npix=32,
        weight_col="imaging_weight", kernel_support=1,
        quantize_scale=1 << 20)
    return grid


def test_ms_pipeline_composed_matches_stepwise(spark, tmp_path):
    from dask_ms_spark.operators.imaging import dirty_image
    from dask_ms_spark.plans import (assert_no_unpartitioned_window,
                                     plan_str)

    store = str(tmp_path / "synth_ms.parquet")
    _write_synth_ms(spark, store)

    # leg 1: ONE lazy plan
    grid = _chain(spark, store)
    # plan audit of the COMPOSITION (not just per-stage): the chain
    # must not multiply into a scale anti-pattern
    plan = plan_str(grid)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert_no_unpartitioned_window(grid, allowed=0)
    img_composed = dirty_image(grid, npix=32)

    # leg 2: every stage materialised to parquet and read back
    stage_dir = tmp_path / "stages"
    stage_dir.mkdir()

    def mat(df, name):
        p = str(stage_dir / f"{name}.parquet")
        df.write.parquet(p)
        return spark.read.parquet(p)

    img_stepwise = dirty_image(_chain(spark, store, mat), npix=32)

    assert img_composed.shape == img_stepwise.shape == (32, 32)
    # bit-exact: every cross-row sum in the chain is fixed-point
    assert np.array_equal(img_composed, img_stepwise)
    # and the image is non-trivial (the calibrated source has power)
    assert float(np.abs(img_composed).max()) > 0.0
