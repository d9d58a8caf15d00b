"""PropertyGraph — the engine's data model: two DataFrames.

Reference data model (src/graph_utils/graph.rs:11-31): nodes and
relationships are hash maps of ``{id, label, metadata: map<string,string>}``
records; every property value is a string (graph.rs:7-8). Here the same
model is two DataFrames:

    nodes:  id STRING, label STRING, properties MAP<STRING,STRING>
    edges:  id STRING, src STRING, dst STRING, label STRING,
            properties MAP<STRING,STRING>

Scale notes: at 100 TB these are Parquet/Delta tables partitioned by
``label`` so ``:Label`` pattern filters become partition pruning; all
mutations are bulk set-operations (anti-joins / unions / map expressions)
that run fully on executors — no driver-side row loops.

Invariants enforced (reference parity):
- edge endpoints must exist (graph.rs:51-66) — ``add_edges`` validates
  with a join-count check;
- deleting a node cascades to incident edges (graph.rs:145-162);
- a plain (non-detach) delete of a node with incident edges is an error
  (cypher_spec.rs:1235-1240: "use DETACH DELETE").
"""

from __future__ import annotations

import os
import time
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graph_loom_spark.ids import uuid7_batch

NODE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("properties", T.MapType(T.StringType(), T.StringType()), False),
    ]
)

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("src", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("properties", T.MapType(T.StringType(), T.StringType()), False),
    ]
)

DEFAULT_LABEL = "_"  # reference: label defaults to "_" (cypher_spec.rs:1322)


class GraphConsistencyError(ValueError):
    """Raised on FK violations / illegal deletes, mirroring reference errors."""


def _tracked_checkpoint(df: DataFrame, tracked: list) -> DataFrame:
    """``localCheckpoint(eager=True)`` and record the pinned block's exact
    RDD id in ``tracked``.

    The checkpointed Dataset's analyzed plan is a ``LogicalRDD`` whose
    ``rdd`` field IS the persisted RDD, so its id keys
    ``getPersistentRDDs`` directly. Tracking exact ids (rather than
    diffing the global persistent-RDD set around the operator) keeps a
    concurrent query's checkpoints safe: in a multi-query service the
    set-difference approach could free blocks some other in-flight
    operator had just pinned — local checkpoints are non-recomputable,
    so that's a hard job failure, not a cache miss."""
    out = df.localCheckpoint(eager=True)
    try:
        tracked.append(out._jdf.queryExecution().analyzed().rdd().id())
    except Exception:
        pass  # tracking is best-effort; worst case the block stays pinned
    return out


def _free_intermediates(spark, tracked_ids) -> None:
    """Unpersist exactly the RDD ids recorded by :func:`_tracked_checkpoint`.

    Iterative operators (LPA, components, layout, var-length BFS)
    ``localCheckpoint`` per round; those blocks otherwise stay pinned
    until the session ends, so a long-lived service (or a 47-query bench
    session) accumulates gigabytes of dead checkpoint state and every
    later query pays eviction + GC churn (measured: the same LPA run
    38 s early-session vs 192 s late). Each operator frees its own
    intermediates, keeping only the eagerly checkpointed result it
    returns."""
    try:
        persistent = dict(spark.sparkContext._jsc.getPersistentRDDs())
        for rid in tracked_ids:
            rdd = persistent.get(rid)
            if rdd is not None:
                rdd.unpersist()
    except Exception:
        pass  # cleanup must never fail the query


class PropertyGraph:
    """A property graph backed by two DataFrames.

    The object is a mutable *handle*; the DataFrames themselves are
    immutable — every mutation swaps in new DataFrames. Long mutation
    chains should call :meth:`materialize` (or :meth:`cache`) to cut
    lineage; the Cypher session does this automatically.
    """

    def __init__(self, spark: SparkSession, nodes: DataFrame | None = None, edges: DataFrame | None = None):
        self.spark = spark
        self._node_sources: dict[str, DataFrame] = {}
        self._edge_sources: dict[str, DataFrame] = {}
        self.nodes = nodes if nodes is not None else spark.createDataFrame([], NODE_SCHEMA)
        self.edges = edges if edges is not None else spark.createDataFrame([], EDGE_SCHEMA)
        self._mutations_since_materialize = 0

    # ------------------------------------------------------------------
    # label-sliced sources (query fixed-overhead optimization)
    # ------------------------------------------------------------------
    # ``nodes``/``edges`` are plain unioned frames; every mutation swaps
    # them wholesale, so they are exposed as properties whose setters
    # drop the per-label source map — a stale slice can never survive a
    # mutation. Projections like io.tpch_graph.build_graph register the
    # per-label ORIGINAL frames (one parquet scan each): a ``:Label``
    # pattern then compiles against a single-scan plan instead of a
    # filter over the 7-branch union, which Catalyst would prune to the
    # same physical scan but only after paying full analysis/optimization
    # of the union tree ON EVERY QUERY (measured ~0.7 s/query of pure
    # planning at sf0.1).

    @property
    def nodes(self) -> DataFrame:
        return self._nodes

    @nodes.setter
    def nodes(self, df: DataFrame) -> None:
        self._nodes = df
        self._node_sources = {}

    @property
    def edges(self) -> DataFrame:
        return self._edges

    @edges.setter
    def edges(self, df: DataFrame) -> None:
        self._edges = df
        self._edge_sources = {}

    def register_label_sources(
        self,
        node_sources: dict[str, DataFrame] | None = None,
        edge_sources: dict[str, DataFrame] | None = None,
    ) -> None:
        """Attach per-label source frames equal to
        ``nodes/edges.filter(label == L)``. Caller guarantees equality;
        any mutation invalidates them automatically (setters above)."""
        if node_sources:
            self._node_sources = dict(node_sources)
        if edge_sources:
            self._edge_sources = dict(edge_sources)

    def nodes_for_label(self, label: str | None) -> DataFrame:
        if label is None:
            return self.nodes
        src = self._node_sources.get(label)
        if src is not None:
            return src
        return self.nodes.filter(F.col("label") == label)

    def edges_for_label(self, label: str | None) -> DataFrame:
        if label is None:
            return self.edges
        src = self._edge_sources.get(label)
        if src is not None:
            return src
        return self.edges.filter(F.col("label") == label)

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------
    @classmethod
    def empty(cls, spark: SparkSession) -> "PropertyGraph":
        return cls(spark)

    @classmethod
    def from_dataframes(cls, nodes: DataFrame, edges: DataFrame) -> "PropertyGraph":
        spark = nodes.sparkSession
        return cls(spark, nodes.select(*NODE_SCHEMA.fieldNames()), edges.select(*EDGE_SCHEMA.fieldNames()))

    # ------------------------------------------------------------------
    # bulk appends (the only way entities enter the graph)
    # ------------------------------------------------------------------
    def add_nodes(self, rows: Iterable[tuple[str, dict[str, str]]]) -> list[str]:
        """Append nodes from (label, properties) pairs; returns new ids.

        Driver-known row lists (the Cypher CREATE path — pattern literals,
        so always small). Bulk loads should build a DataFrame with
        ``uuid7_expr`` instead and use :meth:`add_nodes_df`.
        """
        rows = list(rows)
        if not rows:
            return []
        ids = uuid7_batch(len(rows))
        df = self.spark.createDataFrame(
            [(i, lbl or DEFAULT_LABEL, dict(props or {})) for i, (lbl, props) in zip(ids, rows)],
            NODE_SCHEMA,
        )
        self.nodes = self.nodes.unionByName(df)
        self._bump()
        return ids

    def add_nodes_df(self, df: DataFrame) -> None:
        self.nodes = self.nodes.unionByName(df.select(*NODE_SCHEMA.fieldNames()))
        self._bump()

    def add_edges(
        self,
        rows: Iterable[tuple[str, str, str, dict[str, str]]],
        check_endpoints: bool = True,
    ) -> list[str]:
        """Append edges from (src, dst, label, properties) tuples.

        Endpoint existence is validated with a single join-count check
        (reference rejects edges whose endpoints don't exist,
        graph.rs:51-66).
        """
        rows = list(rows)
        if not rows:
            return []
        ids = uuid7_batch(len(rows))
        df = self.spark.createDataFrame(
            [(i, s, d, lbl or DEFAULT_LABEL, dict(props or {})) for i, (s, d, lbl, props) in zip(ids, rows)],
            EDGE_SCHEMA,
        )
        self.add_edges_df(df, check_endpoints=check_endpoints)
        return ids

    def add_edges_df(self, df: DataFrame, check_endpoints: bool = True) -> None:
        df = df.select(*EDGE_SCHEMA.fieldNames())
        if check_endpoints:
            node_ids = self.nodes.select("id")
            n = df.count()
            ok = (
                df.join(node_ids.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(node_ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
                .count()
            )
            if ok != n:
                raise GraphConsistencyError(
                    f"add_edges: {n - ok} edge(s) reference nonexistent endpoint node(s)"
                )
        self.edges = self.edges.unionByName(df)
        self._bump()

    # ------------------------------------------------------------------
    # deletes
    # ------------------------------------------------------------------
    def delete_edges_by_ids(self, ids_df: DataFrame) -> int:
        """Anti-join delete; returns number of edges removed."""
        ids_df = ids_df.select(F.col(ids_df.columns[0]).alias("id")).distinct()
        before = self.edges.count()
        self.edges = self.edges.join(ids_df, "id", "left_anti")
        self._bump()
        return before - self.edges.count()

    def delete_nodes_by_ids(self, ids_df: DataFrame, detach: bool = False) -> tuple[int, int]:
        """Delete nodes; returns (nodes_removed, edges_removed).

        With ``detach=False`` raises if any target has incident edges
        (reference M4). With ``detach=True`` cascades to incident edges
        via an anti-join on (src OR dst) ∈ deleted set.
        """
        ids_df = ids_df.select(F.col(ids_df.columns[0]).alias("id")).distinct()
        incident = self.edges.join(
            ids_df.withColumnRenamed("id", "_del"),
            (F.col("src") == F.col("_del")) | (F.col("dst") == F.col("_del")),
            "left_semi",
        )
        n_incident = incident.count()
        if n_incident and not detach:
            raise GraphConsistencyError(
                "cannot delete node(s) with relationships; use DETACH DELETE"
            )
        nodes_before = self.nodes.count()
        self.nodes = self.nodes.join(ids_df, "id", "left_anti")
        removed_nodes = nodes_before - self.nodes.count()
        removed_edges = 0
        if n_incident:
            edges_before = self.edges.count()
            self.edges = (
                self.edges.join(ids_df.withColumnRenamed("id", "src"), "src", "left_anti")
                .join(ids_df.withColumnRenamed("id", "dst"), "dst", "left_anti")
            )
            removed_edges = edges_before - self.edges.count()
        self._bump()
        return removed_nodes, removed_edges

    # ------------------------------------------------------------------
    # property / label mutations (reference graph.rs:68-138)
    # ------------------------------------------------------------------
    def upsert_property(self, kind: str, ids_df: DataFrame, key: str, value: str) -> int:
        """SET var.prop = value on all ids in ``ids_df``; returns touched count.

        Compiles to ``map_filter`` (drop the key) + ``map_concat`` (add the
        new value) — upsert semantics independent of the session's
        ``spark.sql.mapKeyDedupPolicy`` (the default EXCEPTION policy
        would throw on a plain map_concat when the key already exists,
        and PropertyGraph accepts any caller-built SparkSession).
        """
        df, setter = self._target(kind)
        ids_df = ids_df.select(F.col(ids_df.columns[0]).alias("id")).distinct()
        marked = df.join(ids_df.withColumn("_hit", F.lit(True)), "id", "left")
        upserted = F.map_concat(
            F.map_filter("properties", lambda k, _: k != F.lit(key)),
            F.create_map(F.lit(key), F.lit(value)),
        )
        updated = marked.withColumn(
            "properties",
            F.when(F.col("_hit"), upserted).otherwise(F.col("properties")),
        ).drop("_hit")
        setter(updated)
        self._bump()
        return ids_df.join(df, "id", "left_semi").count()

    def remove_property(self, kind: str, ids_df: DataFrame, key: str) -> int:
        df, setter = self._target(kind)
        ids_df = ids_df.select(F.col(ids_df.columns[0]).alias("id")).distinct()
        marked = df.join(ids_df.withColumn("_hit", F.lit(True)), "id", "left")
        updated = marked.withColumn(
            "properties",
            F.when(
                F.col("_hit"), F.map_filter("properties", lambda k, _: k != F.lit(key))
            ).otherwise(F.col("properties")),
        ).drop("_hit")
        setter(updated)
        self._bump()
        return ids_df.join(df, "id", "left_semi").count()

    def set_label(self, kind: str, ids_df: DataFrame, label: str) -> int:
        """SET n:NewLabel — *replaces* the single label (graph.rs:68-75)."""
        df, setter = self._target(kind)
        ids_df = ids_df.select(F.col(ids_df.columns[0]).alias("id")).distinct()
        marked = df.join(ids_df.withColumn("_hit", F.lit(True)), "id", "left")
        updated = marked.withColumn(
            "label", F.when(F.col("_hit"), F.lit(label)).otherwise(F.col("label"))
        ).drop("_hit")
        setter(updated)
        self._bump()
        return ids_df.join(df, "id", "left_semi").count()

    def _target(self, kind: str):
        if kind == "node":
            return self.nodes, lambda d: setattr(self, "nodes", d)
        if kind == "rel":
            return self.edges, lambda d: setattr(self, "edges", d)
        raise ValueError(f"unknown entity kind: {kind}")

    # ------------------------------------------------------------------
    # lineage control
    # ------------------------------------------------------------------
    def _bump(self) -> None:
        self._mutations_since_materialize += 1
        # localCheckpoint truncates the logical plan; without it a long
        # mutation script compiles an ever-deeper tree and planning time
        # dominates. Threshold is a trade: each checkpoint is an action.
        if self._mutations_since_materialize >= 8:
            self.cache_checkpoint()

    def cache_checkpoint(self) -> None:
        self.nodes = self.nodes.localCheckpoint(eager=True)
        self.edges = self.edges.localCheckpoint(eager=True)
        self._mutations_since_materialize = 0

    # ------------------------------------------------------------------
    # persistence (reference S5/S6: snapshot load/save, versioned)
    # ------------------------------------------------------------------
    def save(self, path: str, versioned: bool = False) -> str:
        """Write nodes/edges parquet under ``path`` (optionally a timestamped
        version subdir, mirroring the reference's versioned RON snapshots,
        persist.rs:89-131). Returns the directory written."""
        target = path
        if versioned:
            target = os.path.join(path, "versions", time.strftime("%Y%m%dT%H%M%S"))
        self.nodes.write.mode("overwrite").parquet(os.path.join(target, "nodes"))
        self.edges.write.mode("overwrite").parquet(os.path.join(target, "edges"))
        return target

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "PropertyGraph":
        return cls(
            spark,
            spark.read.schema(NODE_SCHEMA).parquet(os.path.join(path, "nodes")),
            spark.read.schema(EDGE_SCHEMA).parquet(os.path.join(path, "edges")),
        )

    @staticmethod
    def list_versions(path: str) -> list[str]:
        vdir = os.path.join(path, "versions")
        if not os.path.isdir(vdir):
            return []
        return sorted(os.listdir(vdir))

    def diff(self, other: "PropertyGraph") -> dict:
        """Snapshot diff vs another graph (e.g. an earlier saved
        version): ``{"nodes_added", "nodes_removed", "nodes_changed",
        "edges_added", "edges_removed", "edges_changed"}`` — each a
        DataFrame. "Changed" = same id, different label or properties
        (edges additionally compare endpoints).

        The natural companion of versioned snapshots (S6): auditing what
        a batch of mutations did, or reviewing drift between two loads.
        Shape: per frame, one full-row anti-join each way on id (AQE
        broadcasts the smaller snapshot side) and one id-equijoin with a
        row-inequality filter — three keyed passes, no collects, so a
        100 TB snapshot pair diffs at scan speed.
        """

        # MapType is not comparable in Spark; canonicalize the properties
        # map to a key-sorted entry array (orderable, equality-safe)
        props_canon = F.array_sort(
            F.transform(
                F.map_entries("properties"),
                lambda e: F.struct(e["key"].alias("k"), e["value"].alias("v")),
            )
        )

        def _three(a: DataFrame, b: DataFrame, cols: list[str]):
            added = a.join(b.select("id"), "id", "left_anti")
            removed = b.join(a.select("id"), "id", "left_anti")
            cmp_cols = [
                props_canon.alias("properties") if c == "properties" else F.col(c)
                for c in cols
            ]
            pa = a.select("id", F.struct(*cmp_cols).alias("__a"))
            pb = b.select("id", F.struct(*cmp_cols).alias("__b"))
            changed_ids = (
                pa.join(pb, "id").filter(F.col("__a") != F.col("__b")).select("id")
            )
            # output the ORIGINAL rows (map-typed properties), not the
            # canonicalized comparison payload
            changed = a.join(changed_ids, "id", "left_semi")
            return added, removed, changed

        na, nr, nc = _three(self.nodes, other.nodes, ["label", "properties"])
        ea, er, ec = _three(
            self.edges, other.edges, ["src", "dst", "label", "properties"]
        )
        return {
            "nodes_added": na,
            "nodes_removed": nr,
            "nodes_changed": nc,
            "edges_added": ea,
            "edges_removed": er,
            "edges_changed": ec,
        }

    # ------------------------------------------------------------------
    # catalog helpers (reference G6)
    # ------------------------------------------------------------------
    def node_labels(self) -> DataFrame:
        return self.nodes.select("label").distinct()

    def edge_labels(self) -> DataFrame:
        return self.edges.select("label").distinct()

    def property_keys(self) -> DataFrame:
        return (
            self.nodes.select(F.explode(F.map_keys("properties")).alias("key"))
            .union(self.edges.select(F.explode(F.map_keys("properties")).alias("key")))
            .distinct()
        )
