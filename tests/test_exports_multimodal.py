"""Exports (S7-S10) + multimodal pipeline plumbing tests."""

from __future__ import annotations

import csv
import json

from graph_loom_spark.graph import PropertyGraph
from graph_loom_spark.io import exports
from graph_loom_spark.ops import multimodal as mm


def _tiny_graph(spark):
    g = PropertyGraph.empty(spark)
    a, b = g.add_nodes([("Person", {"name": "Ada"}), ("Company", {"name": "Acme"})])
    (rid,) = g.add_edges([(a, b, "WORKS_AT", {"since": "2021"})])
    return g, a, b, rid


def test_export_nodes_json(spark, tmp_path):
    g, a, b, _ = _tiny_graph(spark)
    p = str(tmp_path / "nodes.json")
    exports.export_nodes_json(g, spark.createDataFrame([(a,)], "id string"), p)
    data = json.loads(open(p).read())
    assert data == [{"id": a, "label": "Person", "metadata": {"name": "Ada"}}]


def test_export_nodes_csv(spark, tmp_path):
    g, a, b, _ = _tiny_graph(spark)
    p = str(tmp_path / "nodes.csv")
    exports.export_nodes_csv(g, None, p)
    rows = list(csv.reader(open(p)))
    assert rows[0] == ["id", "label", "metadata_json"]
    assert len(rows) == 3


def test_export_graph_json_adjacency(spark, tmp_path):
    g, a, b, rid = _tiny_graph(spark)
    p = str(tmp_path / "graph.json")
    exports.export_graph_json(g, p)
    data = json.loads(open(p).read())
    by_id = {n["id"]: n for n in data["nodes"]}
    assert by_id[a]["out_rels"] == [
        {"rel_id": rid, "label": "WORKS_AT", "peer": b, "direction": "out"}
    ]
    assert by_id[a]["in_rels"] == []
    assert by_id[b]["in_rels"][0]["peer"] == a
    assert data["relationships"] == [
        {"id": rid, "from": a, "to": b, "label": "WORKS_AT", "metadata": {"since": "2021"}}
    ]


def test_export_graph_csv_two_files(spark, tmp_path):
    g, a, b, rid = _tiny_graph(spark)
    nodes_path, rels_path = exports.export_graph_csv(g, str(tmp_path / "graph.csv"))
    nrows = list(csv.reader(open(nodes_path)))
    rrows = list(csv.reader(open(rels_path)))
    assert nrows[0] == ["id", "label", "metadata_json", "out_rels_json", "in_rels_json"]
    assert rrows[0] == ["id", "from", "to", "label", "metadata_json"]
    assert len(nrows) == 3 and len(rrows) == 2
    out_refs = json.loads(dict((r[0], r[3]) for r in nrows[1:])[a])
    assert out_refs == [{"rel_id": rid, "label": "WORKS_AT", "to": b}]


# ---------------------------------------------------------------- multimodal
def test_media_image_features_deterministic(spark):
    media = mm.synthetic_media(spark, n=12)
    feats = mm.image_features(media).collect()
    assert len(feats) == 12
    for r in feats:
        assert r["n_bytes"] == 512  # 8 × 64-char sha hex as bytes
        assert 16 <= r["width"] < 80
        assert len(r["phash"]) == 16
    # pure function of payload → rerun identical
    again = {r["media_id"]: r["phash"] for r in mm.image_features(media).collect()}
    assert all(again[r["media_id"]] == r["phash"] for r in feats)


def test_media_resize_meta_roundtrip(spark):
    media = mm.synthetic_media(spark, n=6)
    out = mm.resize_images(media, max_side=128)
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in media.schema.fields
    ]
    rows = out.collect()
    assert all(r["meta"]["resized_max_side"] == "128" for r in rows)
    assert all(r["meta"]["source"] == "synthetic" for r in rows)


def test_media_sample_frames_bounded(spark):
    media = mm.synthetic_media(spark, n=5)
    frames = mm.sample_frames(media, every_n=2, max_frames=3).collect()
    per_id: dict[str, int] = {}
    for r in frames:
        per_id[r["media_id"]] = per_id.get(r["media_id"], 0) + 1
        assert len(r["frame"]) == 64
    assert all(c <= 3 for c in per_id.values())
    assert len(per_id) == 5


def test_media_stats(spark):
    media = mm.synthetic_media(spark, n=9)
    stats = {r["mime"]: r for r in mm.media_stats(media).collect()}
    assert set(stats) == {"image/png", "audio/wav", "video/mp4"}
    assert all(r["n_items"] == 3 for r in stats.values())
    assert all(r["total_bytes"] == 3 * 512 for r in stats.values())
