#!/usr/bin/env python
"""10x scale-stress for the MS kernel family (SCALE.md experiment #6).

Times bda_average (flag-aware adaptive binning), rfi_flag (rolling
robust z-score) and sigma_clip (iterative k-sigma rejection) on the
sf0.1 embeddings framed as an MS (baseline = vec_id % 64, time =
vec_id) at 1x vs a 10x id-extended copy.  All three are keyed
aggregations/windows over (baseline[, channel]) — the expected curve
is linear in rows with the constant absorbed by partial aggregation.

Usage: python tools/stress_mskernels.py [sf_dir]
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from dask_ms_spark.session import get_spark  # noqa: E402
from dask_ms_spark.operators.bda import bda_average  # noqa: E402
from dask_ms_spark.operators.rfi import rfi_flag, sigma_clip  # noqa: E402


def frame(spark, sf_dir, mult):
    embs = spark.read.parquet(os.path.join(sf_dir,
                                           "embeddings.parquet"))
    n = embs.agg(F.max("vec_id")).collect()[0][0] + 1
    copies = [embs.select((F.col("vec_id") + c * n).alias("vec_id"),
                          "embedding") for c in range(mult)]
    u = copies[0]
    for c in copies[1:]:
        u = u.unionByName(c)
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return u.select(
        (F.col("vec_id") % 64).alias("b"),
        ((F.col("vec_id") % 64 + 1).cast("double") * 25.0).alias("uv"),
        F.col("vec_id").cast("double").alias("t"),
        vec.alias("data"),
        F.transform(vec, lambda x: x <= 0).alias("fl")) \
        .localCheckpoint(eager=True)


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
    spark = get_spark("stress-mskernels")
    spark.sparkContext.setLogLevel("ERROR")
    for label, mult in (("1x", 1), ("10x", 10)):
        d = frame(spark, sf_dir, mult)
        print(f"{label}: {d.count()} rows x 64 channels")
        timed(f"bda[{label}]",
              lambda d=d: bda_average(d, "t", ["b"], "uv", 4.0, 1600.0,
                                      max_factor=16, data_col="data",
                                      flag_col="fl"))
        timed(f"rfi[{label}]",
              lambda d=d: rfi_flag(d, "t", ["b"], "data", "fl",
                                   window=3, k=5.0))
        timed(f"sigma[{label}]",
              lambda d=d: sigma_clip(
                  d.select("b", F.explode("data").alias("x")),
                  "x", ["b"], k=3.0, iters=2))
        d.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
