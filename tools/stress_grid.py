#!/usr/bin/env python
"""10x scale-stress for the gridding family (SCALE.md experiment #7).

Times grid_visibilities (flat + multi-field) and
grid_visibilities_wstack on sf0.1-derived visibilities at 1x vs a
10x id-extended copy.  The structural claim under test: the gridding
exchange is bounded by the GRID (npix^2 cells, x n_planes, x
n_groups), so 10x the visibilities should cost ~10x the scan/map
work and nothing more — the reduce side must not grow.

Usage: python tools/stress_grid.py [sf_dir]
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from dask_ms_spark.session import get_spark  # noqa: E402
from dask_ms_spark.operators.calibration import predict_vis  # noqa: E402
from dask_ms_spark.operators.imaging import (  # noqa: E402
    grid_visibilities, grid_visibilities_wstack)


def vis_frame(spark, sf_dir, mult):
    li = spark.read.parquet(os.path.join(sf_dir,
                                         "lineitem.parquet")) \
        .select((F.col("l_orderkey") * 4 + F.col("l_linenumber"))
                .alias("rid"))
    n = li.agg(F.max("rid")).collect()[0][0] + 1
    copies = [li.select((F.col("rid") + c * n).alias("rid"))
              for c in range(mult)]
    u = copies[0]
    for c in copies[1:]:
        u = u.unionByName(c)
    d = u.select(
        "rid",
        (F.col("rid") % 4).alias("field"),
        ((F.col("rid") * 13.7) % 512.0 - 256.0).alias("u"),
        ((F.col("rid") * 7.3) % 512.0 - 256.0).alias("v"),
        ((F.col("rid") * 3.1) % 200.0 - 100.0).alias("w"))
    vis = predict_vis(d, "u", "v",
                      [(2.0, 1e-3, -2e-3), (1.0, -3e-3, 1.5e-3)])
    return vis.select(
        "field", "u", "v", "w",
        vis.model_vis[0].alias("re"),
        vis.model_vis[1].alias("im")).localCheckpoint(eager=True)


def timed(label, make_df, reps=2):
    last = None
    for r in range(reps):
        t0 = time.time()
        make_df().write.format("noop").mode("overwrite").save()
        last = time.time() - t0
        print(f"{label} run{r}: {last:.2f}s", flush=True)
    return last


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("stress-grid")
    spark.sparkContext.setLogLevel("ERROR")
    for mult in (1, 10):
        df = vis_frame(spark, sf_dir, mult)
        rows = df.count()
        print(f"--- {mult}x: {rows} vis rows")
        timed(f"grid[{mult}x]",
              lambda: grid_visibilities(df, "u", "v", "re", "im",
                                        cell_size=1.0, npix=512))
        timed(f"grid_fields[{mult}x]",
              lambda: grid_visibilities(df, "u", "v", "re", "im",
                                        cell_size=1.0, npix=512,
                                        group_cols=["field"]))
        timed(f"grid_wstack[{mult}x]",
              lambda: grid_visibilities_wstack(
                  df, "u", "v", "w", "re", "im", cell_size=1.0,
                  npix=512, w_step=10.0))
        ncells = grid_visibilities(df, "u", "v", "re", "im",
                                   cell_size=1.0, npix=512).count()
        print(f"occupied cells at {mult}x: {ncells} "
              f"(bound {512 * 512})")
        df.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
