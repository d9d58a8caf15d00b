"""Graph export sinks (reference S7-S10, src/gui/frontend.rs:18-156):
nodes→JSON, nodes→CSV, whole-graph→JSON with denormalized adjacency,
whole-graph→CSV pair.

Two modes per export:
- ``distributed=True`` (the 100 TB path): ``df.write.json/csv`` to a
  directory — executors write shards in parallel, no driver bottleneck.
- ``distributed=False`` (reference parity): one local file with the same
  shapes the Rust exporter writes (single JSON array / single CSV with
  header). Collects to the driver — only for selections that fit there,
  exactly like the reference's in-memory exporter.

The adjacency denormalization (out_rels/in_rels) is two groupBy
aggregations over the edges frame — Θ(edges) total work, versus the
reference's O(nodes × rels) nested scan (frontend.rs:92-100).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_loom_spark.graph import PropertyGraph


def _ensure_parent(path: str) -> None:
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)


# Single-file (reference-parity) exports collect to the driver. At 100 TB
# that is an accidental driver OOM, so every local path is guarded: past
# this many rows the export refuses and points at ``distributed=True``.
# The probe is a limit-N+1 count — bounded work, short-circuits the scan.
DEFAULT_MAX_LOCAL_ROWS = 1_000_000


def _guard_local(df: DataFrame, what: str, max_local_rows: int) -> None:
    if max_local_rows is None or max_local_rows <= 0:  # explicit opt-out
        return
    if df.limit(max_local_rows + 1).count() > max_local_rows:
        raise ValueError(
            f"{what}: selection exceeds max_local_rows={max_local_rows:,}; "
            "the single-file export collects to the driver. Pass "
            "distributed=True to write a sharded directory in parallel, or "
            "raise max_local_rows explicitly if the driver really has room."
        )


def _selected_nodes(graph: PropertyGraph, ids_df: DataFrame | None) -> DataFrame:
    if ids_df is None:
        return graph.nodes
    ids_df = ids_df.select(F.col(ids_df.columns[0]).alias("id"))
    return graph.nodes.join(ids_df, "id", "left_semi")


def export_nodes_json(
    graph: PropertyGraph,
    ids_df: DataFrame | None,
    path: str,
    distributed: bool = False,
    max_local_rows: int = DEFAULT_MAX_LOCAL_ROWS,
) -> str:
    """S7: selected nodes as ``[{id, label, metadata}]`` (frontend.rs:18-40)."""
    sel = _selected_nodes(graph, ids_df).select(
        "id", "label", F.col("properties").alias("metadata")
    )
    if distributed:
        sel.write.mode("overwrite").json(path)
        return path
    _guard_local(sel, "export_nodes_json", max_local_rows)
    _ensure_parent(path)
    rows = [
        {"id": r["id"], "label": r["label"], "metadata": dict(r["metadata"] or {})}
        for r in sel.collect()
    ]
    with open(path, "w") as f:
        json.dump(rows, f, indent=2)
        f.write("\n")
    return path


def export_nodes_csv(
    graph: PropertyGraph,
    ids_df: DataFrame | None,
    path: str,
    distributed: bool = False,
    max_local_rows: int = DEFAULT_MAX_LOCAL_ROWS,
) -> str:
    """S8: selected nodes CSV ``id,label,metadata_json`` (frontend.rs:42-55)."""
    sel = _selected_nodes(graph, ids_df).select(
        "id", "label", F.to_json(F.col("properties")).alias("metadata_json")
    )
    if distributed:
        sel.write.mode("overwrite").option("header", True).csv(path)
        return path
    _guard_local(sel, "export_nodes_csv", max_local_rows)
    _ensure_parent(path)
    import csv

    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "label", "metadata_json"])
        for r in sel.collect():
            w.writerow([r["id"], r["label"], r["metadata_json"]])
    return path


def _adjacency_structs(graph: PropertyGraph) -> DataFrame:
    """Per node id: ``out_rels``/``in_rels`` arrays of {rel_id, label,
    peer, direction} (frontend.rs:58-100) via two aggregations."""
    e = graph.edges
    outs = (
        e.select(
            F.col("src").alias("id"),
            F.struct(
                F.col("id").alias("rel_id"),
                F.col("label"),
                F.col("dst").alias("peer"),
                F.lit("out").alias("direction"),
            ).alias("ref"),
        )
        .groupBy("id")
        .agg(F.collect_list("ref").alias("out_rels"))
    )
    ins = (
        e.select(
            F.col("dst").alias("id"),
            F.struct(
                F.col("id").alias("rel_id"),
                F.col("label"),
                F.col("src").alias("peer"),
                F.lit("in").alias("direction"),
            ).alias("ref"),
        )
        .groupBy("id")
        .agg(F.collect_list("ref").alias("in_rels"))
    )
    empty = F.array().cast(
        "array<struct<rel_id:string,label:string,peer:string,direction:string>>"
    )
    return (
        graph.nodes.join(outs, "id", "left")
        .join(ins, "id", "left")
        .select(
            "id",
            "label",
            F.col("properties").alias("metadata"),
            F.coalesce("out_rels", empty).alias("out_rels"),
            F.coalesce("in_rels", empty).alias("in_rels"),
        )
    )


def export_graph_json(
    graph: PropertyGraph,
    path: str,
    distributed: bool = False,
    max_local_rows: int = DEFAULT_MAX_LOCAL_ROWS,
) -> str:
    """S9: whole graph as ``{nodes: [... with out_rels/in_rels], relationships: [...]}``
    (frontend.rs:58-115). Distributed mode writes the two record sets as
    JSON-lines directories (``{path}/nodes``, ``{path}/relationships``)."""
    nodes = _adjacency_structs(graph)
    rels = graph.edges.select(
        "id",
        F.col("src").alias("from"),
        F.col("dst").alias("to"),
        "label",
        F.col("properties").alias("metadata"),
    )
    if distributed:
        nodes.write.mode("overwrite").json(os.path.join(path, "nodes"))
        rels.write.mode("overwrite").json(os.path.join(path, "relationships"))
        return path
    _guard_local(graph.nodes, "export_graph_json", max_local_rows)
    _guard_local(rels, "export_graph_json", max_local_rows)
    _ensure_parent(path)

    def _refs(arr):
        return [
            {"rel_id": x["rel_id"], "label": x["label"], "peer": x["peer"], "direction": x["direction"]}
            for x in (arr or [])
        ]

    g = {
        "nodes": [
            {
                "id": r["id"],
                "label": r["label"],
                "metadata": dict(r["metadata"] or {}),
                "out_rels": _refs(r["out_rels"]),
                "in_rels": _refs(r["in_rels"]),
            }
            for r in nodes.collect()
        ],
        "relationships": [
            {
                "id": r["id"],
                "from": r["from"],
                "to": r["to"],
                "label": r["label"],
                "metadata": dict(r["metadata"] or {}),
            }
            for r in rels.collect()
        ],
    }
    with open(path, "w") as f:
        json.dump(g, f, indent=2)
        f.write("\n")
    return path


def export_graph_csv(
    graph: PropertyGraph,
    base_path: str,
    distributed: bool = False,
    max_local_rows: int = DEFAULT_MAX_LOCAL_ROWS,
) -> tuple[str, str]:
    """S10: ``{stem}_nodes.csv`` (id,label,metadata_json,out_rels_json,
    in_rels_json — out/in refs keyed ``to``/``from`` like the reference,
    frontend.rs:117-156) + ``{stem}_relationships.csv``."""
    parent = os.path.dirname(os.path.abspath(base_path)) or "."
    stem = os.path.splitext(os.path.basename(base_path))[0] or "graph"
    nodes_path = os.path.join(parent, f"{stem}_nodes.csv")
    rels_path = os.path.join(parent, f"{stem}_relationships.csv")

    adj = _adjacency_structs(graph)
    out_refs = F.transform(
        "out_rels",
        lambda x: F.struct(
            x["rel_id"].alias("rel_id"), x["label"].alias("label"), x["peer"].alias("to")
        ),
    )
    in_refs = F.transform(
        "in_rels",
        lambda x: F.struct(
            x["rel_id"].alias("rel_id"), x["label"].alias("label"), x["peer"].alias("from")
        ),
    )
    nodes_flat = adj.select(
        "id",
        "label",
        F.to_json("metadata").alias("metadata_json"),
        F.to_json(out_refs).alias("out_rels_json"),
        F.to_json(in_refs).alias("in_rels_json"),
    )
    rels_flat = graph.edges.select(
        "id",
        F.col("src").alias("from"),
        F.col("dst").alias("to"),
        "label",
        F.to_json("properties").alias("metadata_json"),
    )
    if distributed:
        nodes_flat.write.mode("overwrite").option("header", True).csv(nodes_path)
        rels_flat.write.mode("overwrite").option("header", True).csv(rels_path)
        return nodes_path, rels_path

    _guard_local(graph.nodes, "export_graph_csv", max_local_rows)
    _guard_local(rels_flat, "export_graph_csv", max_local_rows)

    import csv

    os.makedirs(parent, exist_ok=True)
    with open(nodes_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "label", "metadata_json", "out_rels_json", "in_rels_json"])
        for r in nodes_flat.collect():
            w.writerow([r["id"], r["label"], r["metadata_json"], r["out_rels_json"], r["in_rels_json"]])
    with open(rels_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "from", "to", "label", "metadata_json"])
        for r in rels_flat.collect():
            w.writerow([r["id"], r["from"], r["to"], r["label"], r["metadata_json"]])
    return nodes_path, rels_path
