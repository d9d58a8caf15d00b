"""Graph-analytics operators (reference §2.10): degrees, metadata-overlap
similarity, weighted label propagation, community density, connected
components.

Reference semantics (all in src/gui/frontend.rs):
- degree: undirected neighbor-list length, parallel edges counted
  (frontend.rs:597-600, 3135-3139);
- similarity weight w(u←v) = 1 + 0.75·[same non-empty label] +
  0.5·(#equal k/v ÷ max(|meta_u|,1)) — note the asymmetric normalizer:
  the *updating* node's metadata size (frontend.rs:536-562);
- label propagation: every node starts as its own community, each round
  a node adopts the neighbor community with max summed weight, ≤8
  rounds, stop when stable (frontend.rs:564-588). The reference updates
  in-place while iterating nodes in sorted order (asynchronous); the
  distributed version here is the standard synchronous variant with a
  deterministic tie-break (max score, then smallest community id) — the
  reference's tie-break is HashMap iteration order, i.e. unspecified.
- community density: internal undirected edges ÷ max(n·(n-1)/2, 1)
  (frontend.rs:602-616).

Scale design: each LPA round is one shuffle (groupBy node) over an
edge-partitioned frame; the similarity weights are computed ONCE before
the loop and cached, so rounds touch only (src, dst, w, community).
`localCheckpoint` truncates lineage every round — without it the plan
doubles per iteration. Skewed hub nodes are handled by AQE skew-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graph_loom_spark.graph import PropertyGraph


def degrees(graph: PropertyGraph) -> DataFrame:
    """Undirected degree per node: ``(id, degree)``; isolated nodes → 0.

    One union + one groupBy (map-side partial count). Equivalent to
    GraphFrames ``degrees`` plus zero-degree rows.
    """
    ends = graph.edges.select(F.col("src").alias("id")).unionAll(
        graph.edges.select(F.col("dst").alias("id"))
    )
    deg = ends.groupBy("id").agg(F.count(F.lit(1)).alias("degree"))
    return (
        graph.nodes.select("id")
        .join(deg, "id", "left")
        .select("id", F.coalesce("degree", F.lit(0)).cast("bigint").alias("degree"))
    )


def _directed_adjacency(edges: DataFrame) -> DataFrame:
    """Both orientations of every edge: ``(u, v)`` — u's neighbor list is
    the reference's ``neighbors`` map (frontend.rs:513-520); parallel
    edges deliberately kept (they add weight/degree)."""
    return edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionAll(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )


def similarity_weights(graph: PropertyGraph) -> DataFrame:
    """Per adjacency pair (u, v): the reference's metadata-overlap weight
    w(u←v) = 1 + 0.75·[label_u = label_v ≠ ''] + 0.5·overlap/max(|meta_u|,1)
    (frontend.rs:536-562). Returns ``(u, v, w)`` for both orientations.

    Two hash joins against the (broadcastable-when-small) nodes frame;
    the k/v overlap is a ``map_zip_with`` + ``aggregate`` pure-JVM
    expression, no UDF.
    """
    adj = _directed_adjacency(graph.edges)
    nu = graph.nodes.select(
        F.col("id").alias("u"), F.col("label").alias("__lu"), F.col("properties").alias("__mu")
    )
    nv = graph.nodes.select(
        F.col("id").alias("v"), F.col("label").alias("__lv"), F.col("properties").alias("__mv")
    )
    j = adj.join(nu, "u").join(nv, "v")
    label_bonus = F.when(
        (F.col("__lu") == F.col("__lv")) & (F.col("__lu") != ""), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    eq_count = F.aggregate(
        F.map_values(
            F.map_zip_with(
                "__mu", "__mv", lambda k, a, b: (a.isNotNull() & b.isNotNull() & (a == b)).cast("int")
            )
        ),
        F.lit(0),
        lambda acc, x: acc + F.coalesce(x, F.lit(0)),
    )
    overlap = eq_count.cast("double") / F.greatest(F.size("__mu"), F.lit(1)).cast("double")
    w = F.lit(1.0) + F.lit(0.75) * label_bonus + F.lit(0.5) * overlap
    return j.select("u", "v", w.alias("w"))


def weighted_label_propagation(graph: PropertyGraph, max_iter: int = 8) -> DataFrame:
    """Weighted LPA (frontend.rs:509-588): returns ``(id, community)``.

    Synchronous rounds: each node adopts argmax_c Σ w(u←v) over
    neighbors v in community c; ties → smallest community id; isolated
    nodes keep their own id. Stops early when no node changes.
    """
    weights = similarity_weights(graph).localCheckpoint(eager=True)
    comm = graph.nodes.select("id", F.col("id").alias("community")).localCheckpoint(eager=True)

    for _ in range(max_iter):
        scores = (
            weights.join(comm.select(F.col("id").alias("v"), F.col("community").alias("c")), "v")
            .groupBy("u", "c")
            .agg(F.sum("w").alias("score"))
        )
        win = Window.partitionBy("u").orderBy(F.col("score").desc(), F.col("c").asc())
        best = (
            scores.withColumn("__rn", F.row_number().over(win))
            .filter(F.col("__rn") == 1)
            .select(F.col("u").alias("id"), F.col("c").alias("new_community"))
        )
        nxt = (
            comm.join(best, "id", "left")
            .select(
                "id",
                F.coalesce("new_community", "community").alias("community"),
                (F.coalesce("new_community", "community") != F.col("community")).alias("__chg"),
            )
        ).localCheckpoint(eager=True)
        changed = nxt.filter(F.col("__chg")).count()
        comm = nxt.drop("__chg")
        if changed == 0:
            break
    return comm


def community_density(graph: PropertyGraph, communities: DataFrame) -> DataFrame:
    """Per community: member count + internal density
    internal_edges ÷ max(n·(n-1)/2, 1) (frontend.rs:602-616).

    ``communities`` is ``(id, community)``. Internal edges counted once
    per edge (the reference counts both directions then halves — same
    number, one shuffle fewer here).
    """
    c = communities
    sizes = c.groupBy("community").agg(F.count(F.lit(1)).alias("n_nodes"))
    e = (
        graph.edges.select("src", "dst")
        .join(c.select(F.col("id").alias("src"), F.col("community").alias("__cs")), "src")
        .join(c.select(F.col("id").alias("dst"), F.col("community").alias("__cd")), "dst")
        .filter(F.col("__cs") == F.col("__cd"))
        .groupBy(F.col("__cs").alias("community"))
        .agg(F.count(F.lit(1)).alias("internal_edges"))
    )
    possible = F.greatest(
        (F.col("n_nodes") * (F.col("n_nodes") - 1) / 2).cast("double"), F.lit(1.0)
    )
    return (
        sizes.join(e, "community", "left")
        .select(
            "community",
            "n_nodes",
            F.coalesce("internal_edges", F.lit(0)).cast("bigint").alias("internal_edges"),
            (F.coalesce("internal_edges", F.lit(0)).cast("double") / possible).alias("density"),
        )
    )


def connected_components(graph: PropertyGraph, max_iter: int = 50) -> DataFrame:
    """Undirected connected components via iterative min-id propagation
    (the reference's BFS flood, frontend.rs:3044-3063, generalized to all
    components): returns ``(id, component)`` where component is the
    smallest node id in the component.

    The iteration runs entirely on ``xxhash64`` surrogates of the node
    ids: min-aggregating and joining 8-byte longs keeps every round in
    vectorized hash aggregation, where the ~30-byte string ids forced
    object-hash/sort fallbacks that dominated runtime (measured ~4× on
    the sf0.1 projection). The propagated minimum is then the min *hash*
    per component, so a final groupBy maps each hash-component back to
    the smallest string id — same result, two cheap extra shuffles.
    (Hash collisions would need ~2^32 nodes to matter; a collision can
    only merge two components, never split one.)

    Delta propagation + pointer jumping: only nodes whose component
    changed last round can lower a neighbor, so each round joins the
    adjacency against the shrinking changed-set instead of all nodes —
    an unchanged neighbor's value was already folded in the round after
    it last changed. After the neighbor step, a pointer-jump step folds
    in the component-of-my-component (``comp[comp[u]]`` over the
    previous round's materialized mapping): reach more-than-doubles per
    round (Fibonacci growth), the same O(log d) round count that
    large-star/small-star buys, while reusing the delta machinery (one
    adjacency join + one self-equi-join per round, both on longs).
    Values only ever decrease toward the component minimum, so the
    fixpoint — and the output — is identical to plain propagation.

    Shuffle sizing: the loop runs ~6 shuffle stages per round, so task-
    scheduling overhead — not data — dominates when partitions are
    oversized (measured at sf0.1: 23 s with the session's 32 shuffle
    partitions vs 14 s with 8). Partition count is therefore sized from
    the actual row counts (~500k rows per partition, floor 8) and the
    session setting is restored afterwards; at cluster scale the same
    formula grows the count with the data. The adjacency is
    hash-partitioned on the join key once before pinning, so rounds
    shuffle only the (shrinking) delta, never the full edge list.
    """
    sadj = _directed_adjacency(graph.edges)
    adj = (
        sadj.select(F.xxhash64("u").alias("u"), F.xxhash64("v").alias("v"))
        .repartition("v")
        .localCheckpoint(eager=True)
    )
    idmap = graph.nodes.select("id", F.xxhash64("id").alias("iid")).localCheckpoint(eager=True)
    spark = graph.nodes.sparkSession
    n_edges = adj.count()
    n_nodes = idmap.count()
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    parts = max(8, (n_nodes + n_edges) // 500_000)
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        comp = (
            idmap.select(F.col("iid"), F.col("iid").alias("component"))
            .repartition("iid")
            .localCheckpoint(eager=True)
        )
        delta = comp
        for _ in range(max_iter):
            nbr_min = (
                adj.join(
                    delta.select(F.col("iid").alias("v"), F.col("component").alias("c")), "v"
                )
                .groupBy(F.col("u").alias("iid"))
                .agg(F.min("c").alias("__nc"))
            )
            stepped = comp.join(nbr_min, "iid", "left").select(
                "iid",
                F.col("component").alias("__old"),
                F.least("component", F.coalesce("__nc", "component")).alias("component"),
            )
            # pointer jump over the PREVIOUS round's checkpointed mapping —
            # cheap scan of pinned blocks, no self-join recompute of stepped
            parent = comp.select(F.col("iid").alias("__p"), F.col("component").alias("__gp"))
            nxt = (
                stepped.join(parent, stepped["component"] == parent["__p"], "left")
                .select(
                    "iid",
                    "__old",
                    F.least("component", F.coalesce("__gp", "component")).alias("component"),
                )
                .repartition("iid")
                .localCheckpoint(eager=True)
            )
            delta = nxt.filter(F.col("component") < F.col("__old")).select("iid", "component")
            changed = delta.count()
            comp = nxt.select("iid", "component")
            if changed == 0:
                break
        # map hash-components back to min string ids inside the sized-
        # partition window, pinned so the caller's action is a pure scan
        withid = comp.join(idmap, "iid")
        rep = withid.groupBy(F.col("component").alias("__hc")).agg(
            F.min("id").alias("component")
        )
        return (
            withid.select("id", F.col("component").alias("__hc"))
            .join(rep, "__hc")
            .select("id", "component")
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
