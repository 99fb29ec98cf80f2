#!/usr/bin/env python
"""10x scale-stress for the ANN family (SCALE.md experiment #4).

Builds a 10x embedding corpus (10 id-shifted copies of sf0.1
embeddings, each copy deterministically perturbed so copies are
near-but-not-identical neighbours — a harsher ANN input than iid
noise, since every true neighbourhood is 10x denser), then measures
the four search tiers with the SAME 50-query set at 1x vs 10x:

  * brute_force_topk — exact broadcast cross-scan: the O(n) floor;
  * ivf_topk        — cell-local scoring: the sub-linear path;
  * lsh_topk        — bucket-local scoring with hamming-1 multiprobe;
  * pq_topk         — asymmetric-distance scan over 8-byte codes
                      (encode included; production persists codes the
                      way build_ivf_index persists cells).

Usage: python tools/stress_ann.py [sf_dir]
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from dask_ms_spark.session import get_spark  # noqa: E402
from dask_ms_spark.llm.similarity import (  # noqa: E402
    brute_force_topk, ivf_topk, lsh_topk, pq_topk)


def build_10x(spark, sf_dir, out):
    embs = spark.read.parquet(os.path.join(sf_dir,
                                           "embeddings.parquet"))
    n = embs.agg(F.max("vec_id")).collect()[0][0] + 1
    copies = []
    for c in range(10):
        # shift ids, nudge every element by a copy-specific epsilon:
        # copies stay close (dense neighbourhoods) but distinct
        eps = 1e-3 * (c + 1)
        copies.append(embs.select(
            (F.col("vec_id") + c * n).alias("vec_id"),
            F.transform(F.col("embedding").cast("array<double>"),
                        lambda x: x + F.lit(eps)).alias("embedding"),
            "label"))
    u = copies[0]
    for c in copies[1:]:
        u = u.unionByName(c)
    u.write.mode("overwrite").parquet(out)


def timed(label, make_df, reps=2):
    best = None
    for r in range(reps):
        t0 = time.time()
        make_df().write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        print(f"{label} run{r}: {dt:.2f}s", flush=True)
        best = dt                     # steady = last run
    return best


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ten_dir = os.path.join("/tmp", f"stress_ann_{os.getpid()}")
    spark = get_spark("stress-ann")
    spark.sparkContext.setLogLevel("ERROR")

    build_10x(spark, sf_dir, ten_dir)
    one = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")) \
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    ten = spark.read.parquet(ten_dir)
    queries = one.where("vec_id < 50")
    n1, n10 = one.count(), ten.count()
    print(f"corpus 1x={n1} 10x={n10}")

    for label, corpus in (("1x", one), ("10x", ten)):
        timed(f"brute[{label}]",
              lambda c=corpus: brute_force_topk(c, queries, k=10))
        timed(f"ivf[{label}]",
              lambda c=corpus: ivf_topk(c, queries, k=10,
                                        num_cells=64, nprobe=4))
        timed(f"lsh[{label}]",
              lambda c=corpus: lsh_topk(c, queries, dim=64, k=10,
                                        num_planes=10))
        timed(f"pq[{label}]",
              lambda c=corpus: pq_topk(c, queries, dim=64, k=10,
                                       num_sub=8, num_codes=16))
        timed(f"pq+rerank[{label}]",
              lambda c=corpus: pq_topk(c, queries, dim=64, k=10,
                                       num_sub=8, num_codes=16,
                                       rerank=50))
    spark.stop()


if __name__ == "__main__":
    main()
