#!/usr/bin/env python
"""10x scale-stress for the Zones cross-match (SCALE.md experiment #5).

Builds 1x and 10x synthetic catalogs (the registry query's golden-angle
walk, extended to 10x the ids — sky density grows 10x, so the per-cell
candidate count does too) and measures crossmatch_sky against the
brute-force cross join at both scales.  The interesting curve is
candidate-pair volume: zones candidates grow ~linearly with density x
catalog size, brute force grows with the PRODUCT of catalog sizes.

Usage: python tools/stress_crossmatch.py
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from dask_ms_spark.session import get_spark  # noqa: E402
from dask_ms_spark.operators.crossmatch import (  # noqa: E402
    angular_sep_deg, crossmatch_sky)


def catalog(spark, n, id_off=0, perturb=False):
    # coordinates derive from the BASE id, so the offset catalog is a
    # perturbed copy of the same sky, not a different walk
    base = spark.range(n)
    ra = (F.col("id") * 137.508) % 360.0
    dec = ((F.col("id") * 7.919) % 120.0) - 60.0
    if perturb:
        ra = (ra + 360.0 + 0.2 * ((F.col("id") % 5) - 2) / 2) % 360.0
        dec = dec + 0.2 * ((F.col("id") % 3) - 1) / 2
    return base.select((F.col("id") + id_off).alias("id"),
                       ra.alias("ra"), dec.alias("dec"))


def timed(label, make_df, reps=2):
    last = None
    for r in range(reps):
        t0 = time.time()
        n = make_df().count()
        last = time.time() - t0
        print(f"{label} run{r}: {last:.2f}s ({n} pairs)", flush=True)
    return last


def main():
    spark = get_spark("stress-crossmatch")
    spark.sparkContext.setLogLevel("ERROR")
    radius = 0.25
    for label, n in (("1x", 20_000), ("10x", 200_000)):
        left = catalog(spark, n)
        right = catalog(spark, n, id_off=10_000_000, perturb=True)
        timed(f"zones[{label}]",
              lambda l=left, r=right: crossmatch_sky(
                  l, r, radius, max_abs_dec=61.0))
        if n <= 20_000:   # brute force is O(n^2): only run at 1x
            timed(f"brute[{label}]",
                  lambda l=left, r=right: l.crossJoin(r.selectExpr(
                      "id as rid", "ra as ra2", "dec as dec2"))
                  .where(angular_sep_deg(
                      F.col("ra"), F.col("dec"),
                      F.col("ra2"), F.col("dec2")) <= radius))
    spark.stop()


if __name__ == "__main__":
    main()
