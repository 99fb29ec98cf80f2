#!/usr/bin/env python
"""10x scale-stress for the time-series family (SCALE.md #8).

Two deliberately different 10x growth directions:

* ``cusum_changepoints`` grows the PER-KEY stream length 10x with the
  key count fixed (5 event_types) — the long-stream window hazard the
  operator docstring names: one sorted window per key, so wall should
  grow ~linearly in rows while parallelism is capped at n_keys until
  range partitioning splits the sort.
* ``resample_fill`` grows the KEY COUNT 10x (user_id-shifted copies,
  same per-key length) — the embarrassingly-parallel direction; wall
  should grow sub-linearly (more keys, same per-key work, 32 cores).

Usage: python tools/stress_timeseries.py [sf_dir]
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from dask_ms_spark.session import get_spark  # noqa: E402
from dask_ms_spark.streaming.events import read_events  # noqa: E402
from dask_ms_spark.operators.timeseries import (  # noqa: E402
    cusum_changepoints, resample_fill)


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
    spark = get_spark("stress-timeseries")
    spark.sparkContext.setLogLevel("ERROR")
    ev = read_events(spark, os.path.join(sf_dir, "events.parquet"))
    n_id = ev.agg(F.max("event_id")).collect()[0][0] + 1
    n_uid = ev.agg(F.max("user_id")).collect()[0][0] + 1
    span = ev.agg(F.expr(
        "timestampdiff(SECOND, min(ts), max(ts)) + 1").alias("s")) \
        .collect()[0][0]

    def copies(mult, shift_users):
        # stream-extend: copy c appends AFTER copy c-1 in time, so
        # per-key streams get 10x longer (cusum direction); with
        # shift_users, keys multiply instead (resample direction).
        cs = []
        for c in range(mult):
            cs.append(ev.select(
                (F.col("event_id") + c * n_id).alias("event_id"),
                F.expr(f"timestampadd(SECOND, {c * span}, ts)")
                .alias("ts"),
                (F.col("user_id") + (c * n_uid if shift_users else 0))
                .alias("user_id"),
                "event_type", "value"))
        u = cs[0]
        for c in cs[1:]:
            u = u.unionByName(c)
        return u.localCheckpoint(eager=True)

    for mult in (1, 10):
        long_streams = copies(mult, shift_users=False)
        wide_keys = copies(mult, shift_users=True)
        n = long_streams.count()
        print(f"--- mult={mult} rows={n}")
        timed(f"cusum x{mult}", lambda: cusum_changepoints(
            long_streams, value_col="value",
            order_cols=("ts", "event_id"), by="event_type",
            quantize_scale=1 << 12))
        timed(f"resample x{mult}", lambda: resample_fill(
            wide_keys, ts_col="ts", key_col="user_id",
            value_col="value", step_seconds=3600))


if __name__ == "__main__":
    main()
