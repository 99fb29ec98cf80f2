#!/usr/bin/env python
"""10x scale-stress for the graph family (SCALE.md experiment #2).

Builds the same synthetic 10x corpus as the round-5 LSH experiment
(10 id-shifted copies of sf0.1 documents, each copy's words prefix-
rewritten so copies are NOT cross-copy near-dups — 10x the work, not a
quadratic near-dup blowup), then measures:

  * pagerank (2 power iterations) over the minhash-LSH candidate
    graph at 1x vs 10x — the per-iteration join+agg shuffle curve;
  * triangle_count at 1x vs 10x — the wedge-volume curve;
  * triangle_count degree-orientation A/B on a synthetic hub graph
    (20 hubs x 10k spokes + closing ring) — the curse-of-the-last-
    reducer case the (degree, id) orientation exists for.

Usage: python tools/stress_graph.py [sf_dir]
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import Window, functions as F  # noqa: E402

from dask_ms_spark.session import get_spark  # noqa: E402


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


def timed(label, make_df):
    # construction included: pagerank materialises its edge set with
    # an EAGER localCheckpoint at build time, which is real work
    t0 = time.time()
    make_df().write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(f"{label}: {dt:.2f}s")
    return dt


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("stress-graph", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    from dask_ms_spark.llm.dedup import minhash_lsh_pairs
    from dask_ms_spark.operators.graph import pagerank, triangle_count

    tenx = "/tmp/dms_stress_docs10x"
    if not os.path.isdir(tenx):
        build_10x(spark, sf_dir, tenx)

    docs1 = spark.read.parquet(os.path.join(sf_dir,
                                            "documents.parquet"))
    docs10 = spark.read.parquet(tenx)

    for label, docs in (("1x", docs1), ("10x", docs10)):
        pairs = minhash_lsh_pairs(docs, num_hashes=16, num_bands=4,
                                  shingle_k=5, threshold=0.5,
                                  max_bucket_size=300) \
            .localCheckpoint()
        n_edges = pairs.count()
        print(f"[{label}] candidate edges: {n_edges}")
        # warm each plan shape once at tiny scale happens naturally in
        # the 1x pass; report steady second run of each measurement
        for run in (1, 2):
            timed(f"[{label}] pagerank run{run}",
                  lambda: pagerank(pairs, iterations=2))
        for run in (1, 2):
            timed(f"[{label}] triangle_count run{run}",
                  lambda: triangle_count(pairs))

    # ---- orientation A/B on a hub graph --------------------------
    hubs, spokes = 20, 2000
    ids = spark.range(hubs * spokes)
    star = ids.select((F.col("id") % hubs).alias("id_a"),
                      (F.col("id") + hubs).alias("id_b"))
    ring = ids.select((F.col("id") + hubs).alias("id_a"),
                      ((F.col("id") + 1) % (hubs * spokes) + hubs)
                      .alias("id_b"))
    g = star.unionByName(ring).localCheckpoint()
    print(f"hub graph: {g.count()} edges, {hubs} hubs of degree "
          f"{spokes}")

    def triangle_id_oriented(edges):
        # the pre-round-6 formulation: orientation by id only
        e = (edges.select(F.least("id_a", "id_b").alias("u"),
                          F.greatest("id_a", "id_b").alias("v"))
             .where(F.col("u") != F.col("v")).distinct()
             .localCheckpoint(eager=False))
        wedges = (e.alias("x").join(
            e.alias("y"), (F.col("x.u") == F.col("y.u"))
            & (F.col("x.v") < F.col("y.v")))
            .select(F.col("x.u").alias("a"), F.col("x.v").alias("b"),
                    F.col("y.v").alias("c")))
        closed = wedges.join(
            e.select(F.col("u").alias("b"), F.col("v").alias("c")),
            ["b", "c"])
        return (closed.select(F.explode(F.array("a", "b", "c"))
                              .alias("id"))
                .groupBy("id").agg(F.count(F.lit(1))
                                   .alias("n_triangles")))

    for run in (1, 2):
        timed(f"[hub] id-oriented run{run}",
              lambda: triangle_id_oriented(g))
    for run in (1, 2):
        timed(f"[hub] degree-oriented run{run}",
              lambda: triangle_count(g))

    spark.stop()


if __name__ == "__main__":
    main()
