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
                         max_iter: int = 25,
                         check_every: int = 2) -> DataFrame:
    """Label each node with the minimum node id reachable from it.

    ``edges`` is undirected input (each pair listed once is enough);
    ``nodes`` optionally supplies isolated nodes (they come back as
    singleton components labelled by their own id).  Returns
    ``(id, component)``.

    ``check_every`` propagation rounds are chained *lazily* and
    materialized as one job: per-round actions (checkpoint + count)
    were the dominant cost — round count, not data volume — so paying
    them once per batch cuts wall-clock ~check_every× while executing
    the identical label recurrence.  Convergence is detected from the
    label-sum, which strictly decreases while any label changes
    (min-label propagation is monotone); the sum is a decimal
    aggregate, overflow-safe for 64-bit ids.  Raises ``RuntimeError``
    if the labels never stabilize within ``max_iter`` rounds —
    returning silently would hand callers incorrectly split clusters
    with no signal.
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

    def step(lab: DataFrame) -> DataFrame:
        neigh_min = (undir.join(lab.withColumnRenamed(id_col, "s"),
                                on="s")
                     .groupBy(F.col("d").alias(id_col))
                     .agg(F.min("component").alias("neigh_comp")))
        return (lab.join(neigh_min, on=id_col, how="left")
                .select(F.col(id_col),
                        F.least("component",
                                F.coalesce("neigh_comp",
                                           F.col("component")))
                        .alias("component")))

    def label_sum(lab: DataFrame):
        return lab.agg(
            F.sum(F.col("component").cast("decimal(38,0)"))).first()[0]

    prev_sum = label_sum(labels)
    it, converged = 0, False
    while it < max_iter and not converged:
        for _ in range(min(check_every, max_iter - it)):
            labels = step(labels)
            it += 1
        labels = labels.localCheckpoint()
        cur_sum = label_sum(labels)
        if cur_sum == prev_sum:
            converged = True
        prev_sum = cur_sum
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} "
            "rounds; raise max_iter for long-chain graphs")
    if nodes is not None:
        singletons = (nodes.select(F.col(id_col))
                      .join(labels, on=id_col, how="left_anti")
                      .select(id_col, F.col(id_col).alias("component")))
        labels = labels.unionByName(singletons)
    return labels
