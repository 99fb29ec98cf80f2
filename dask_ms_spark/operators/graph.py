"""Iterative graph operators on DataFrames.

No reference analogue; the driving use case is corpus dedup, where
near-duplicate candidate pairs form a graph and the unit of
deduplication is the *connected component* (transitive closure), not
the pair — A~B and B~C must land in one cluster even when A~C was
never sampled as a candidate.

``connected_components`` uses alternating **large-star / small-star
contraction** (the MapReduce CC algorithm of Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14):

* *large-star*: every node connects its strictly-larger neighbours to
  the minimum of its neighbourhood;
* *small-star*: every node connects its smaller neighbours (and
  itself) to that minimum.

Each phase is one aggregation + one join over the *current* edge set,
and the edge set monotonically contracts toward a star forest centred
on each component's minimum id.  Convergence takes O(log n) rounds —
versus O(component diameter) for plain min-label propagation — which
is the difference that matters at 100 TB, where a single long-chain
component (e.g. templated boilerplate shifting gradually across a
crawl) would otherwise serialize hundreds of shuffle rounds.  Each
round materializes lazily (``localCheckpoint(eager=False)``) so the
convergence checksum is the round's only job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


__all__ = ["connected_components", "pagerank", "triangle_count"]


def _star_round(e: DataFrame) -> DataFrame:
    """One large-star + small-star round.

    ``e`` holds canonical directed edges ``(u, v)`` with ``u > v``;
    the output is in the same orientation (both phases emit
    ``(x, m)`` with ``m`` the neighbourhood minimum, so ``m < x`` by
    construction).
    """
    # large-star over the undirected adjacency: for each node u with
    # m = min(N(u) ∪ {u}), emit (x, m) for every neighbour x > u
    und = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (und.groupBy("u").agg(F.min("v").alias("m"))
            .select("u", F.least("u", "m").alias("m")))
    # no distinct here: duplicate intermediate edges only pad the
    # small-star aggregation input and are cheaper than the extra
    # shuffle a dedup would cost; the round's final distinct restores
    # set semantics for the convergence checksum
    large = (und.join(mins, "u")
             .where(F.col("v") > F.col("u"))
             .select(F.col("v").alias("u"), F.col("m").alias("v"))
             .where(F.col("u") != F.col("v")))
    # small-star on the (u > v)-oriented result: for each node u with
    # m = min of its smaller neighbours, emit (x, m) for every smaller
    # neighbour x plus u itself
    mins2 = large.groupBy("u").agg(F.min("v").alias("m"))
    small = (large.join(mins2, "u")
             .select(F.col("v").alias("u"), F.col("m").alias("v"))
             .unionByName(mins2.select("u", F.col("m").alias("v")))
             .where(F.col("u") != F.col("v"))
             .distinct())
    return small


def _local_components(e: DataFrame, id_col: str) -> DataFrame:
    """Single-task union-find over a small materialized edge set.

    The labels are identical to the star-contraction fixed point
    (minimum reachable id per component) and independent of edge
    order: union-find roots are order-dependent, but the final label
    is re-derived as the min id over each root's members.  Runs as one
    executor task (``mapInPandas`` over a single coalesced partition)
    — no driver collect; ~5M edges resolve in a few seconds in one
    task, versus O(log n) rounds of 5 shuffles each.
    """
    id_type = dict((f.name, f.dataType.simpleString())
                   for f in e.schema.fields)["u"]

    def unionfind(pdf_iter):
        import pandas as pd

        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for pdf in pdf_iter:
            # tolist() yields plain Python ints — smaller and faster
            # dict keys than boxed numpy scalars at the 2M-edge bound.
            for u, v in zip(pdf["u"].tolist(), pdf["v"].tolist()):
                parent.setdefault(u, u)
                parent.setdefault(v, v)
                ru, rv = find(u), find(v)
                if ru != rv:
                    parent[ru] = rv
        if not parent:
            yield pd.DataFrame({"id": [], "component": []})
            return
        ids = list(parent)
        roots = [find(x) for x in ids]
        df = pd.DataFrame({"id": ids, "root": roots})
        df["component"] = df.groupby("root")["id"].transform("min")
        yield df[["id", "component"]]

    return e.coalesce(1).mapInPandas(
        unionfind, schema=f"id {id_type}, component {id_type}") \
        .withColumnRenamed("id", id_col)


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b",
                         nodes: DataFrame | None = None,
                         id_col: str = "id",
                         max_iter: int = 25,
                         check_every: int = 1,
                         local_threshold: int = 2_000_000) -> DataFrame:
    """Label each node with the minimum node id reachable from it.

    ``edges`` is undirected input (each pair listed once is enough);
    ``nodes`` optionally supplies isolated nodes (they come back as
    singleton components labelled by their own id).  Returns
    ``(id, component)``.

    Convergence is detected from an (edge-count, hash-sum) checksum of
    the contracted edge set: star rounds reach a fixed point exactly
    when the set stops changing (the fixed points of both phases are
    star forests).  The hash-sum uses a 64-bit edge hash summed in
    decimal — an undetected collision needs two *different* edge sets
    with equal count and equal sum, vanishingly unlikely and
    self-correcting the next round.  Raises ``RuntimeError`` if the
    edge set never stabilizes within ``max_iter`` rounds (star
    contraction needs O(log n); 25 covers any realistic graph) —
    returning silently would hand callers incorrectly split clusters
    with no signal.  ``check_every`` rounds share one materialization
    job; with O(log n) total rounds the default of 1 keeps peak memory
    at a single edge generation.

    **Size-adaptive fast path**: after LSH candidate generation the
    edge set is typically orders of magnitude smaller than the corpus
    (near-dup pairs, not documents).  When the materialized distinct
    edge count is at most ``local_threshold``, the component labels
    come from a single-task union-find (:func:`_local_components`)
    instead of the shuffle rounds — the iterative machinery only pays
    off once the edge set itself no longer fits one task.  Set
    ``local_threshold=0`` to force star contraction (tests do, to
    exercise both paths against each other).
    """
    # Materialise the canonical edge list ONCE.  ``edges`` is typically
    # the tail of an expensive pipeline (shingle->minhash->LSH);
    # without this, every round's join would replay that pipeline.
    e = (edges
         .select(F.greatest(F.col(src), F.col(dst)).alias("u"),
                 F.least(F.col(src), F.col(dst)).alias("v"))
         .where(F.col("u") != F.col("v"))
         .distinct()
         .localCheckpoint())
    # Iterate ONLY over edge-touched nodes.  Nodes in no candidate
    # pair are singletons by definition; carrying them through every
    # round would shuffle the full corpus per iteration at scale,
    # when the candidate subgraph is orders of magnitude smaller.
    members = (e.select(F.col("u").alias(id_col))
               .unionByName(e.select(F.col("v").alias(id_col)))
               .distinct())

    if local_threshold and e.count() <= local_threshold:
        # count is one cheap pass over the already-checkpointed edges
        labels = _local_components(e, id_col)
        if nodes is not None:
            singletons = (nodes.select(F.col(id_col))
                          .join(members, on=id_col, how="left_anti")
                          .select(id_col,
                                  F.col(id_col).alias("component")))
            labels = labels.unionByName(singletons)
        return labels

    def checksum(frame: DataFrame):
        row = frame.agg(
            F.count(F.lit(1)),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
            F.countDistinct("u")).first()
        return (row[0], row[1]), row[0] == row[2]

    def is_star_forest(frame: DataFrame) -> bool:
        # given out-degree 1 everywhere (checked by the caller), the
        # set is a star forest iff no source also appears as a target;
        # then every component is one star centred on its minimum
        return (frame.select("u")
                .join(frame.select(F.col("v").alias("u")), "u",
                      "left_semi")
                .limit(1).count() == 0)

    prev, _ = checksum(e)
    converged = False
    for _ in range(max_iter):
        for _ in range(check_every):
            e = _star_round(e)
        e = e.localCheckpoint(eager=False)
        # one job per round: the checkpoint materializes under the
        # checksum aggregation
        cur, degree_one = checksum(e)
        if cur == prev:
            converged = True
            break
        prev = cur
        # early fixed-point exit: checksum-equality alone needs one
        # extra (unchanged) round to fire; the star-forest test
        # detects convergence on the round that produced it
        if degree_one and is_star_forest(e):
            converged = True
            break
    if not converged:
        # one final round: did the last permitted round already reach
        # the fixed point?  (change is otherwise detected one round
        # after stabilization)
        if checksum(_star_round(e))[0] != prev:
            raise RuntimeError(
                f"connected_components did not converge within "
                f"{max_iter} rounds; raise max_iter")

    # fixed point is a star forest: every non-root points at its
    # component's minimum id; roots are re-derived from membership
    labels = (members
              .join(e.select(F.col("u").alias(id_col),
                             F.col("v").alias("component")),
                    on=id_col, how="left")
              .select(id_col,
                      F.coalesce("component", F.col(id_col))
                      .alias("component")))
    if nodes is not None:
        singletons = (nodes.select(F.col(id_col))
                      .join(members, on=id_col, how="left_anti")
                      .select(id_col, F.col(id_col).alias("component")))
        labels = labels.unionByName(singletons)
    return labels


def pagerank(edges: DataFrame, src: str = "id_a", dst: str = "id_b",
             iterations: int = 2, damping: float = 0.85,
             nodes: DataFrame | None = None, id_col: str = "id",
             scale: int = 1 << 20) -> DataFrame:
    """Power-iteration PageRank over an undirected edge set (each
    input pair becomes two directed edges) — centrality over the
    near-duplicate candidate graph surfaces template hubs that
    pairwise scores miss.

    Unnormalised formulation (rank_0 = 1, rank = (1-d) + d * sum of
    in-contributions), the fixed-point GraphX/Pregel convention —
    no global N dependence, so incremental corpora don't reshift
    every rank.  Per-iteration cost is one join + one aggregation,
    both keyed on node ids; contributions are quantised to
    ``scale``-fixed-point int64 before the sum (the kmeans
    discipline), so ranks are bit-identical under any shuffle order
    and any engine mirroring the arithmetic.

    ``nodes`` optionally supplies isolated nodes, which take the
    teleport rank (1 - damping).  The edge set is materialised once
    (``localCheckpoint``) so iterations never replay the upstream
    candidate pipeline.
    """
    e = (edges
         .select(F.greatest(F.col(src), F.col(dst)).alias("u"),
                 F.least(F.col(src), F.col(dst)).alias("v"))
         .where(F.col("u") != F.col("v"))
         .distinct())
    directed = (e.select(F.col("u").alias("s"), F.col("v").alias("d"))
                .unionByName(
                    e.select(F.col("v").alias("s"),
                             F.col("u").alias("d")))
                .localCheckpoint())
    deg = directed.groupBy("s").agg(
        F.count(F.lit(1)).alias("outdeg"))
    ranks = deg.select("s", F.lit(1.0).alias("rank"))
    base = float(1.0 - damping)
    for _ in range(iterations):
        contrib = (directed.join(deg, "s").join(ranks, "s")
                   .select("d", F.round(F.col("rank")
                                        / F.col("outdeg")
                                        * F.lit(float(scale)))
                           .cast("long").alias("qc")))
        sums = contrib.groupBy("d").agg(F.sum("qc").alias("qsum"))
        ranks = (deg.join(sums, deg["s"] == sums["d"], "left")
                 .select(F.col("s"),
                         (F.lit(base) + F.lit(float(damping))
                          * F.coalesce(F.col("qsum"), F.lit(0))
                          / F.lit(float(scale))).alias("rank"))
                 # truncate lineage: without this, each iteration
                 # re-nests the previous plan and analysis cost grows
                 # with iteration count (lazy: materialises with the
                 # next job, no extra job per round)
                 .localCheckpoint(eager=False))
    out = ranks.select(F.col("s").alias(id_col), "rank")
    if nodes is not None:
        iso = (nodes.select(F.col(id_col))
               .join(out.select(id_col), on=id_col, how="left_anti")
               .select(id_col, F.lit(base).alias("rank")))
        out = out.unionByName(iso)
    return out


def triangle_count(edges: DataFrame, src: str = "id_a",
                   dst: str = "id_b") -> DataFrame:
    """Per-node triangle count and local clustering coefficient over
    an undirected edge set — the standard graph-density diagnostic for
    a near-dup candidate graph: high-triangle nodes sit inside dense
    template cliques (drop the whole clique), while triangle-free
    nodes are chance pair hits (keep; pairwise score noise).

    Algorithm (the canonical two-join MapReduce shape, Suri & Vassilvitskii
    "Counting Triangles and the Curse of the Last Reducer", WWW'11):
    canonicalise edges and distinct them; ORIENT every edge from its
    lower-(degree, id) endpoint to its higher one; build wedges (b, c)
    around each apex a by self-joining the oriented edge set on its
    source; close each wedge with one more equi-join against the
    oriented edges.  Every stage is an equi-join on node ids — no
    cross product anywhere.

    The degree orientation is the whole point of the paper (and the
    100 TB story): each triangle is generated exactly once at its
    LOWEST-degree vertex, so wedge volume is sum(out_deg^2) with
    out-degrees skew-bounded to O(sqrt(m)) — a degree-d hub produces
    ~0 wedges instead of d^2/2.  Measured on the 10x near-dup
    candidate graph (SCALE.md "graph family at 10x"): orientation by
    id alone lets one boilerplate hub own the last reducer; by
    (degree, id) the wedge count collapses to the skew-free bound.
    Results are identical either way — orientation only changes WHERE
    each triangle is counted.

    Returns ``(id, degree, n_triangles, clustering_coeff)`` with
    coeff = 2*T / (d*(d-1)) rounded to 6 dp (0 when degree < 2).
    """
    e = (edges
         .select(F.least(F.col(src), F.col(dst)).alias("u"),
                 F.greatest(F.col(src), F.col(dst)).alias("v"))
         .where(F.col("u") != F.col("v"))
         .distinct()
         # persist A/B-rejected r13 (1.51x with similarity's probes):
         # the truncated-lineage leaf feeds the triangle self-join
         # better statistics than an InMemoryRelation does
         .localCheckpoint(eager=False))
    deg = (e.select(F.col("u").alias("id"))
           .unionByName(e.select(F.col("v").alias("id")))
           .groupBy("id").agg(F.count(F.lit(1)).alias("degree")))
    # orient each edge low-(degree, id) -> high-(degree, id); carry
    # the destination's order key so wedge pairs and closure edges
    # compare without re-joining degrees
    du = deg.select(F.col("id").alias("u"),
                    F.col("degree").alias("du"))
    dv = deg.select(F.col("id").alias("v"),
                    F.col("degree").alias("dv"))
    ranked = e.join(du, "u").join(dv, "v")
    fwd = F.struct(F.col("du").alias("d"), F.col("u").alias("n")) \
        < F.struct(F.col("dv").alias("d"), F.col("v").alias("n"))
    oriented = (ranked.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("t"),
        F.when(fwd, F.struct(F.col("dv").alias("d"),
                             F.col("v").alias("n")))
         .otherwise(F.struct(F.col("du").alias("d"),
                             F.col("u").alias("n"))).alias("tkey"))
        .localCheckpoint(eager=False))
    # wedges around apex a: oriented out-neighbours b, c with
    # tkey(b) < tkey(c) — each triangle appears exactly once, at its
    # lowest-(degree, id) vertex
    wedges = (oriented.alias("x").join(
        oriented.alias("y"),
        (F.col("x.s") == F.col("y.s"))
        & (F.col("x.tkey") < F.col("y.tkey")))
        .select(F.col("x.s").alias("a"), F.col("x.t").alias("b"),
                F.col("y.t").alias("c")))
    # closure: the (b, c) edge is oriented b -> c because
    # tkey(b) < tkey(c)
    closed = wedges.join(
        oriented.select(F.col("s").alias("b"), F.col("t").alias("c")),
        ["b", "c"])
    tri = (closed.select(F.explode(F.array("a", "b", "c")).alias("id"))
           .groupBy("id").agg(F.count(F.lit(1)).alias("n_triangles")))
    d = F.col("degree").cast("double")
    return (deg.join(tri, "id", "left")
            .select("id", F.col("degree").cast("long").alias("degree"),
                    F.coalesce(F.col("n_triangles"), F.lit(0))
                     .cast("long").alias("n_triangles"),
                    F.when(F.col("degree") >= 2,
                           F.round(2.0 * F.coalesce(F.col("n_triangles"),
                                                    F.lit(0))
                                   / (d * (d - 1.0)), 6))
                     .otherwise(F.lit(0.0)).alias("clustering_coeff")))
