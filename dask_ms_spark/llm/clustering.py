"""Embedding clustering (semantic bucketing) for corpus pipelines.

Lloyd k-means over an embedding column, written so every step is an
engine-exact deterministic recipe (the oracle-parity rule of this
repo):

* init: centroids are the ``k`` lowest-id vectors (no RNG);
* assign: exact double squared-distance, ties broken by lowest
  centroid index;
* update: centroid means run in **fixed-point** — each coordinate is
  scaled by 2^20 and rounded to int64, summed exactly (order
  independent, unlike float sums across shuffle partitions), then
  divided back in double.  Quantizing the update at 2^-20 costs
  nothing at embedding precision (float32 inputs) and is what makes
  two engines agree bit-for-bit.

The plan is the canonical distributed k-means shape: the centroid
table (k rows) broadcasts; assignment is a map-side cross join +
argmin, so the corpus never shuffles for scoring; the update is one
partial-merged aggregation keyed on (cluster, coordinate).  Per
iteration: one broadcast, one shuffle of k*dim int64 partial sums.

Use cases at 100 TB: semantic dedup (drop near-identical cluster
cores), mixture balancing (sample per cluster), and as the coarse
quantizer feeding IVF ANN (llm/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["kmeans_assign"]


def kmeans_assign(embs: DataFrame, vec_col: str = "embedding",
                  id_col: str = "vec_id", k: int = 8, iters: int = 2,
                  scale: int = 1 << 20) -> DataFrame:
    """Assign each vector to a k-means cluster after ``iters`` Lloyd
    iterations.  Returns ``(id_col, cluster, dist)`` with ``dist`` the
    Euclidean distance to the final centroid, rounded to 6 dp.

    Deterministic by construction — see the module docstring.  An
    empty cluster simply drops out of the next centroid table (both
    the Spark plan and any SQL mirror lose the same group row).
    """
    pts = embs.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double"))
         .alias("vec"))
    cents = (pts.orderBy("id").limit(k)
             .select(F.row_number().over(Window.orderBy("id"))
                     .alias("cidx"),
                     F.col("vec").alias("cvec")))

    d2 = F.aggregate(
        F.zip_with("vec", "cvec", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x)
    assigned = None
    for it in range(iters):
        scored = (pts.crossJoin(F.broadcast(cents))
                  .select("id", "vec", "cidx", d2.alias("d2")))
        # struct-min argmin: (d2, cidx) lexicographic — exact-double
        # compare, lowest centroid index on mathematical ties
        assigned = (scored
                    .groupBy("id")
                    .agg(F.min(F.struct("d2", "cidx", "vec")).alias("m"))
                    .select("id", F.col("m.cidx").alias("cidx"),
                            F.col("m.d2").alias("d2"),
                            F.col("m.vec").alias("vec")))
        if it < iters - 1:
            qx = F.transform(
                "vec", lambda x: F.round(x * F.lit(float(scale)))
                .cast("long"))
            ex = assigned.select(
                "cidx", F.posexplode(qx).alias("pos", "qx"))
            means = (ex.groupBy("cidx", "pos")
                     .agg((F.sum("qx").cast("double")
                           / (F.count(F.lit(1)) * F.lit(scale))
                           .cast("double")).alias("cx")))
            cents = (means.groupBy("cidx")
                     .agg(F.array_sort(
                         F.collect_list(F.struct("pos", "cx")))
                         .alias("pcs"))
                     .select("cidx",
                             F.transform("pcs", lambda s: s["cx"])
                             .alias("cvec")))
    return assigned.select(
        F.col("id").alias(id_col),
        F.col("cidx").cast("long").alias("cluster"),
        F.round(F.sqrt("d2"), 6).alias("dist"))
