#!/usr/bin/env python
"""10x distinct-value stress for the KMV sketch family (SCALE.md
experiment #11).

Round 7's verdict found the KMV k-minimum trims spelled as
unpartitioned row_number windows — a single-task global sort of the
full distinct-hash table, in the exact operator whose contract is
"k rows regardless of corpus size".  The fix (orderBy(h).limit(k) =
TakeOrderedAndProject) keeps every task at a k-row heap.  This
experiment proves the fixed plan holds its claim under DISTINCT-VALUE
growth (the KMV load axis — row growth without new distinct values is
absorbed by the pre-trim ``distinct``):

  * corpus: 10 id-shifted copies of sf documents with copy-prefixed
    words (the stress #5 generator) — 10x rows AND ~10x the shingle
    vocabulary, so the distinct-hash table the trim consumes really
    grows 10x;
  * measures ``kmv_distinct`` (ungrouped — the branch that WAS the
    global sort) and ``kmv_overlap`` at 1x vs 10x;
  * asserts the trim plan stays TakeOrderedAndProject (no
    unpartitioned Window / no sort-only single-partition exchange)
    and reports the max per-partition row count entering the trim —
    the "no single fat task" check runs on data, not vibes.

Usage: python tools/stress_sketches.py [sf_dir]
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from dask_ms_spark.session import get_spark  # noqa: E402
from dask_ms_spark.functions.text import portable_hash64  # noqa: E402
from dask_ms_spark.llm.sketches import (kmv_distinct,  # noqa: E402
                                        kmv_overlap)

_SHINGLE_SQL = (
    "transform(sequence(1, greatest(size(split(lower(text), "
    "'\\\\s+')) - 2, 0)), i -> concat_ws(' ', slice(split(lower(text),"
    " '\\\\s+'), i, 3)))")


def build_10x(spark, sf_dir, out):
    docs = spark.read.parquet(os.path.join(sf_dir,
                                           "documents.parquet"))
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    copies = []
    for c in range(10):
        prefix = chr(97 + c)
        copies.append(docs.select(
            (F.col("doc_id") + c * n).alias("doc_id"),
            F.regexp_replace("text", r"(\b\w)", prefix + r"$1")
             .alias("text"),
            "lang", "source"))
    u = copies[0]
    for c in copies[1:]:
        u = u.unionByName(c)
    u.write.mode("overwrite").parquet(out)


def shingled(docs):
    return docs.select("doc_id",
                       F.explode(F.expr(_SHINGLE_SQL))
                       .alias("shingle"))


def timed(label, make_df):
    t0 = time.time()
    make_df().write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(f"{label}: {dt:.2f}s")
    return dt


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("stress-sketches")
    spark.sparkContext.setLogLevel("ERROR")

    out10 = "/tmp/stress_sketches_10x.parquet"
    if not os.path.exists(out10):
        build_10x(spark, sf_dir, out10)

    docs1 = spark.read.parquet(os.path.join(sf_dir,
                                            "documents.parquet"))
    docs10 = spark.read.parquet(out10)

    for tag, docs in (("1x", docs1), ("10x", docs10)):
        sh = shingled(docs)
        nd = sh.select("shingle").distinct().count()
        # max rows any ONE task feeds the trim: with
        # TakeOrderedAndProject each task keeps a k-heap over its own
        # partition; a fat task here would mean the distinct output
        # skewed, not the trim serialising
        parts = (sh.select(portable_hash64(F.col("shingle"))
                           .alias("h")).distinct()
                 .groupBy(F.spark_partition_id().alias("p")).count()
                 .agg(F.max("count")).collect()[0][0])
        print(f"[{tag}] distinct shingles={nd}  "
              f"max distinct-partition rows={parts}")

        plan = kmv_distinct(sh, "shingle", k=256) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan, plan
        assert "Window" not in plan, plan
        t_d = timed(f"[{tag}] kmv_distinct(ungrouped, k=256)",
                    lambda: kmv_distinct(sh, "shingle", k=256))
        half_a = sh.where(F.col("doc_id") % 2 == 0)
        half_b = sh.where(F.col("doc_id") % 2 == 1)
        t_o = timed(f"[{tag}] kmv_overlap(k=256)",
                    lambda: kmv_overlap(half_a, half_b, "shingle",
                                        k=256))
        print(f"[{tag}] total {t_d + t_o:.2f}s")


if __name__ == "__main__":
    main()
