#!/usr/bin/env python
"""Scale-stress for the CDC/ops family (SCALE.md #9).

Two growth directions against ``apply_cdc``:

* DELTA grows 100x (0.15k -> 1.5k -> 15k -> 150k changes) with the
  snapshot fixed — the per-batch cost must track the delta, not the
  table ("O(delta) apply"), so walls should stay near-flat until the
  delta rivals the snapshot;
* SNAPSHOT grows 10x (id-shifted copies) with the delta fixed — the
  apply re-reads the table once (inevitable: the output IS the next
  snapshot) but must NOT shuffle it: the changed-key set broadcasts,
  so wall should grow like a scan, not like a join.

Usage: python tools/stress_cdc.py [sf_dir]
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from dask_ms_spark.session import get_spark  # noqa: E402
from dask_ms_spark.operators.cdc import apply_cdc  # noqa: E402


def timed(label, make_df, reps=2):
    last = None
    for r in range(reps):
        t0 = time.time()
        make_df().write.format("noop").mode("overwrite").save()
        last = time.time() - t0
        print(f"{label} run{r}: {last:.2f}s", flush=True)
    return last


def changes_of(snap, n):
    # deterministic op mix over the first n keys: U for key%3<2
    # (payload perturbed), D for key%3==2
    c = (snap.orderBy("o_orderkey").limit(n)
         .select("*",
                 F.when(F.col("o_orderkey") % 3 < 2, F.lit("U"))
                  .otherwise(F.lit("D")).alias("op"),
                 F.lit(1).alias("seq"))
         .withColumn("o_totalprice", F.col("o_totalprice") + 1.0))
    return c.localCheckpoint(eager=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("stress-cdc")
    spark.sparkContext.setLogLevel("ERROR")
    snap = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    n_snap = snap.count()
    print(f"snapshot rows: {n_snap}")

    for n in (150, 1_500, 15_000, 150_000):
        ch = changes_of(snap, min(n, n_snap))
        timed(f"delta={n}", lambda: apply_cdc(snap, ch, "o_orderkey"))

    # 10x snapshot, fixed delta
    kmax = snap.agg(F.max("o_orderkey")).collect()[0][0] + 1
    copies = [snap.select(
        (F.col("o_orderkey") + c * kmax).alias("o_orderkey"),
        *[x for x in snap.columns if x != "o_orderkey"])
        for c in range(10)]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big = big.localCheckpoint(eager=True)
    ch = changes_of(snap, 15_000)
    timed("snapshot x10, delta=15k",
          lambda: apply_cdc(big, ch, "o_orderkey"))


if __name__ == "__main__":
    main()
