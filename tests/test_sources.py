"""Round-trip + quarantine tests for the table sources (JSONL/CSV/ORC
document drops with explicit schemas — the beyond-reference ingest
surface)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from graph_loom_spark.io import sources

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return sources.read_documents(spark, f"{SF_DIR}/documents.parquet")


def test_documents_jsonl_roundtrip(spark, tmp_path):
    docs = _docs(spark)
    p = str(tmp_path / "docs_jsonl")
    sources.write_table(docs, p, "jsonl")
    back, bad = sources.quarantine(sources.read_documents(spark, p, "jsonl"))
    assert bad.count() == 0
    a = sorted(docs.collect(), key=lambda r: r["doc_id"])
    b = sorted(back.collect(), key=lambda r: r["doc_id"])
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_documents_csv_roundtrip(spark, tmp_path):
    docs = _docs(spark)
    p = str(tmp_path / "docs_csv")
    sources.write_table(docs, p, "csv")
    back, bad = sources.quarantine(sources.read_documents(spark, p, "csv"))
    assert bad.count() == 0
    assert back.count() == docs.count()
    # spot-check content equality on a sample row
    a = docs.filter(F.col("doc_id") == 3).head().asDict()
    b = back.filter(F.col("doc_id") == 3).head().asDict()
    assert a == b


def test_embeddings_jsonl_roundtrip_parses_vector(spark, tmp_path):
    emb = sources.read_embeddings(spark, f"{SF_DIR}/embeddings.parquet")
    p = str(tmp_path / "emb_jsonl")
    sources.write_table(
        emb.withColumn("embedding", F.to_json("embedding")), p, "jsonl"
    )
    back = sources.read_embeddings(spark, p, "jsonl")
    row_a = emb.filter(F.col("vec_id") == 5).head()
    row_b = back.filter(F.col("vec_id") == 5).head()
    assert row_b["embedding"] is not None
    assert list(row_a["embedding"]) == list(row_b["embedding"])


def test_corrupt_jsonl_rows_quarantine_not_crash(spark, tmp_path):
    p = tmp_path / "drop"
    p.mkdir()
    (p / "part-0.jsonl").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "THIS IS NOT JSON\n"
        '{"doc_id": "not-a-number", "text": 7}\n'
    )
    df = sources.read_documents(spark, str(p), "jsonl")
    clean, bad = sources.quarantine(df)
    assert clean.count() == 1
    assert bad.count() == 2
    assert clean.head()["doc_id"] == 1


def test_orc_roundtrip(spark, tmp_path):
    docs = _docs(spark)
    p = str(tmp_path / "docs_orc")
    sources.write_table(docs, p, "orc")
    back = sources.read_documents(spark, p, "orc")
    assert back.count() == docs.count()
    assert sorted(back.columns) == sorted(docs.columns)


def test_unsupported_format_raises(spark):
    try:
        sources.read_documents(spark, "/nonexistent", "avro")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "avro" in str(e)


def test_graph_diff_roundtrip(spark, tmp_path):
    """Snapshot diff: added / removed / changed nodes and edges between
    a saved version and a mutated successor."""
    from graph_loom_spark.graph import PropertyGraph
    from graph_loom_spark.interface import CypherSession

    sess = CypherSession(PropertyGraph.empty(spark))
    sess.execute('CREATE (a:P {name:"a"})')
    sess.execute('CREATE (b:P {name:"b"})')
    sess.execute('MATCH (a:P),(b:P) WHERE id(a) < id(b) MERGE (a)-[:R]->(b)')
    g = sess.graph
    g.save(str(tmp_path / "v0"))
    before = PropertyGraph.load(spark, str(tmp_path / "v0"))

    sess.execute('CREATE (c:P {name:"c"})')          # added node
    # RETURN form: WHERE..SET without RETURN is the reference's
    # filter-becomes-SET-items quirk (see test_quirks)
    sess.execute('MATCH (a:P) WHERE a.name = "a" SET a.touched = "1" RETURN a')

    d = g.diff(before)
    added = {r["properties"]["name"] for r in d["nodes_added"].collect()}
    changed = {r["properties"]["name"] for r in d["nodes_changed"].collect()}
    assert added == {"c"}
    assert changed == {"a"}
    assert d["nodes_removed"].count() == 0
    assert d["edges_added"].count() == 0 and d["edges_removed"].count() == 0
    # reverse direction: the old snapshot sees "c" as removed
    rd = before.diff(g)
    assert {r["properties"]["name"] for r in rd["nodes_removed"].collect()} == {"c"}


def test_export_training_shards_roundtrip_and_manifest(spark, tmp_path):
    import pytest

    rows = [(i, "tok " * (1 + i % 5) + "end", "en", "s", 1) for i in range(25)]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    out = str(tmp_path / "shards")
    manifest = {
        r["shard"]: (r["n_docs"], r["n_tokens"], r["n_chars"])
        for r in sources.export_training_shards(docs, out, docs_per_shard=10).collect()
    }
    # deterministic shard membership: ids 0-9 -> 0, 10-19 -> 1, 20-24 -> 2
    assert {s: m[0] for s, m in manifest.items()} == {0: 10, 1: 10, 2: 5}
    exp_tokens = {s: 0 for s in (0, 1, 2)}
    exp_chars = {s: 0 for s in (0, 1, 2)}
    for i, t, *_ in rows:
        exp_tokens[i // 10] += len(t.split())
        exp_chars[i // 10] += len(t)
    assert {s: m[1] for s, m in manifest.items()} == exp_tokens
    assert {s: m[2] for s, m in manifest.items()} == exp_chars

    # round-trip: partitioned JSONL reads back to the exact corpus
    back = spark.read.schema(
        "doc_id bigint, text string, lang string, source string, n_chars bigint, shard bigint"
    ).json(out)
    got = {
        (r["doc_id"], r["text"], r["shard"]) for r in back.collect()
    }
    assert got == {(i, t, i // 10) for i, t, *_ in rows}
    with pytest.raises(ValueError):
        sources.export_training_shards(docs, out, docs_per_shard=0)


def test_read_media_dir_roundtrips_real_payloads(spark, tmp_path):
    """Files written to disk and ingested via the binaryFile source must
    decode identically to the same payloads shipped through the
    synthetic media table (byte-for-byte data column, correct mime from
    the extension, lineage meta)."""
    from graph_loom_spark.io.sources import read_media_dir
    from graph_loom_spark.ops.multimodal import _payload_for, image_features

    d = tmp_path / "media"
    d.mkdir()
    for seq, ext in [(0, "bmp"), (1, "wav"), (2, "ppm"), (3, "png")]:
        (d / f"m{seq}.{ext}").write_bytes(_payload_for(seq, ext))
    (d / "notes.txt").write_text("not media")

    media = read_media_dir(spark, str(d), glob="*.{bmp,wav,ppm,png}")
    rows = {r["media_id"]: r for r in media.collect()}
    assert set(rows) == {"m0.bmp", "m1.wav", "m2.ppm", "m3.png"}
    assert rows["m0.bmp"]["mime"] == "image/bmp"
    assert rows["m1.wav"]["mime"] == "audio/wav"
    assert bytes(rows["m2.ppm"]["data"]) == _payload_for(2, "ppm")
    assert rows["m3.png"]["meta"]["kind"] == "png"
    assert int(rows["m0.bmp"]["meta"]["bytes"]) == len(_payload_for(0, "bmp"))

    # the decoders accept the frame as-is: every image decodes
    feats = {r["media_id"]: r for r in image_features(media.filter("mime like 'image/%'")).collect()}
    assert len(feats) == 3
    assert all(r["width"] is not None and r["phash"] is not None for r in feats.values())


def test_read_media_dir_same_basename_in_subdirs_does_not_collide(spark, tmp_path):
    """media_id is the load-root-RELATIVE path: identically named files
    under different subdirectories (the object-store-prefix layout) must
    get distinct ids (ADVICE r7 — basename-only ids silently corrupted
    downstream dedup keyed on media_id)."""
    from graph_loom_spark.io.sources import read_media_dir
    from graph_loom_spark.ops.multimodal import _payload_for

    d = tmp_path / "lake"
    for sub, seq in [("batch1", 0), ("batch2", 1)]:
        (d / sub).mkdir(parents=True)
        (d / sub / "frame.bmp").write_bytes(_payload_for(seq, "bmp"))

    media = read_media_dir(spark, str(d), glob="*.bmp")
    rows = {r["media_id"]: bytes(r["data"]) for r in media.collect()}
    assert set(rows) == {"batch1/frame.bmp", "batch2/frame.bmp"}
    assert rows["batch1/frame.bmp"] != rows["batch2/frame.bmp"]


def test_read_media_dir_root_with_space_and_percent_stays_relative(
    spark, tmp_path
):
    """Spark's binaryFile reports paths URI-encoded (space → %20) while
    the caller's root is a raw OS path; the extractor must still match
    the root and emit load-root-RELATIVE ids — not fall back to
    absolute-URI media_ids (ADVICE r8). Covers both an encodable char
    (space) and a char that is itself an escape lead-in (%)."""
    from graph_loom_spark.io.sources import read_media_dir
    from graph_loom_spark.ops.multimodal import _payload_for

    for name in ["media lake", "pct%25dir", "a+b dir", "eq=amp& (x)"]:
        d = tmp_path / name
        (d / "sub").mkdir(parents=True)
        (d / "a.bmp").write_bytes(_payload_for(0, "bmp"))
        (d / "sub" / "b.bmp").write_bytes(_payload_for(1, "bmp"))

        media = read_media_dir(spark, str(d), glob="*.bmp")
        ids = sorted(r["media_id"] for r in media.collect())
        assert len(ids) == 2, (name, ids)
        # relative: no scheme, no leading slash, subdir preserved
        assert all(
            not i.startswith(("file:", "/")) for i in ids
        ), (name, ids)
        assert any(i.endswith("a.bmp") for i in ids), (name, ids)
        assert any("sub" in i and i.endswith("b.bmp") for i in ids), (
            name,
            ids,
        )
