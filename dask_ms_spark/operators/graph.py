"""Iterative graph operators on DataFrames.

No reference analogue; the driving use case is corpus dedup, where
near-duplicate candidate pairs form a graph and the unit of
deduplication is the *connected component* (transitive closure), not
the pair — A~B and B~C must land in one cluster even when A~C was
never sampled as a candidate.

``connected_components`` is min-label propagation: every node starts
labelled with its own id, and each round every node takes the minimum
label among itself and its neighbours.  Convergence takes
O(component diameter) rounds — small for dedup graphs, whose
components are near-cliques.  Each round is one join + one
aggregation (2 shuffles); ``localCheckpoint`` truncates the growing
lineage so round N's plan doesn't replay rounds 1..N-1.  For
web-scale graphs with long chains, the large-star/small-star variant
halves rounds at the cost of bigger intermediate edges — the loop
structure here is the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b",
                         nodes: DataFrame | None = None,
                         id_col: str = "id",
                         max_iter: int = 25) -> DataFrame:
    """Label each node with the minimum node id reachable from it.

    ``edges`` is undirected input (each pair listed once is enough);
    ``nodes`` optionally supplies isolated nodes (they come back as
    singleton components labelled by their own id).  Returns
    ``(id, component)``.  The convergence check is a driver-side
    ``count`` of changed labels — an aggregate, not a collect.
    """
    # Materialise the edge list ONCE.  ``edges`` is typically the tail
    # of an expensive pipeline (shingle->minhash->LSH); without this,
    # every iteration's join would replay that whole pipeline.
    undir = (edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
             .unionByName(edges.select(F.col(dst).alias("s"),
                                       F.col(src).alias("d")))
             .localCheckpoint())
    # Iterate ONLY over edge-touched nodes.  Nodes in no candidate
    # pair are singletons by definition; carrying them through every
    # round would shuffle the full corpus per iteration at scale,
    # when the candidate subgraph is orders of magnitude smaller.
    members = undir.select(F.col("s").alias(id_col)).distinct()
    labels = members.select(id_col, F.col(id_col).alias("component")) \
                    .localCheckpoint()
    for _ in range(max_iter):
        neigh_min = (undir.join(labels.withColumnRenamed(id_col, "s"),
                                on="s")
                     .groupBy(F.col("d").alias(id_col))
                     .agg(F.min("component").alias("neigh_comp")))
        # One pass computes both the new label and a changed flag, so
        # the convergence check is a count on the checkpointed result
        # instead of an extra self-join per round.
        stepped = (labels.join(neigh_min, on=id_col, how="left")
                   .select(F.col(id_col),
                           F.least("component",
                                   F.coalesce("neigh_comp",
                                              F.col("component")))
                           .alias("component"),
                           (F.coalesce("neigh_comp", F.col("component"))
                            < F.col("component")).alias("_changed"))
                   .localCheckpoint())
        changed = stepped.where("_changed").count()
        labels = stepped.drop("_changed")
        if changed == 0:
            break
    if nodes is not None:
        singletons = (nodes.select(F.col(id_col))
                      .join(labels, on=id_col, how="left_anti")
                      .select(id_col, F.col(id_col).alias("component")))
        labels = labels.unionByName(singletons)
    return labels
