#!/usr/bin/env python
"""10x scale-stress for the broadcast-state ML family (SCALE.md #10).

``kmeans_assign`` (broadcast centroids, map-side assignment, k*dim
partial-sum update per iteration) and ``logistic_train`` (broadcast
weights, fixed-point gradient sums) share the textbook distributed
shape: per-iteration state is O(k*dim) / O(n_features) regardless of
row count, so 10x rows should cost ~linear map work with NO
state/shuffle growth.

Usage: python tools/stress_cluster.py [sf_dir]
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from dask_ms_spark.session import get_spark  # noqa: E402
from dask_ms_spark.llm.clustering import kmeans_assign  # noqa: E402
from dask_ms_spark.llm.classifier import logistic_train  # noqa: E402


def timed(label, fn, reps=2):
    last = None
    for r in range(reps):
        t0 = time.time()
        fn()
        last = time.time() - t0
        print(f"{label} run{r}: {last:.2f}s", flush=True)
    return last


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("stress-cluster")
    spark.sparkContext.setLogLevel("ERROR")
    embs = spark.read.parquet(os.path.join(sf_dir,
                                           "embeddings.parquet"))
    n = embs.agg(F.max("vec_id")).collect()[0][0] + 1

    def grow(mult):
        cs = [embs.select((F.col("vec_id") + c * n).alias("vec_id"),
                          "embedding", "label")
              for c in range(mult)]
        u = cs[0]
        for c in cs[1:]:
            u = u.unionByName(c)
        return u.localCheckpoint(eager=True)

    for mult in (1, 10):
        d = grow(mult)
        print(f"--- mult={mult} rows={d.count()}")
        timed(f"kmeans x{mult}", lambda: kmeans_assign(
            d, k=8, iters=2).write.format("noop")
            .mode("overwrite").save())
        feats = d.select(
            (F.col("label") % 2).cast("double").alias("y"),
            F.element_at("embedding", 1).cast("double").alias("f1"),
            F.element_at("embedding", 2).cast("double").alias("f2"),
            F.element_at("embedding", 3).cast("double").alias("f3"))
        timed(f"logistic x{mult}", lambda: logistic_train(
            feats, ["f1", "f2", "f3"], "y", iters=2))


if __name__ == "__main__":
    main()
