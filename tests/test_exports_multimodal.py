"""Exports (S7-S10) + multimodal pipeline plumbing tests."""

from __future__ import annotations

import csv
import json

from graph_loom_spark.graph import PropertyGraph
from graph_loom_spark.io import exports
from graph_loom_spark.ops import codecs
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


def test_export_local_size_guard(spark, tmp_path):
    """Single-file exports refuse past max_local_rows and point at the
    distributed path; the distributed path itself stays un-guarded."""
    import pytest

    g, a, b, _ = _tiny_graph(spark)
    with pytest.raises(ValueError, match="distributed=True"):
        exports.export_nodes_json(g, None, str(tmp_path / "n.json"), max_local_rows=1)
    with pytest.raises(ValueError, match="distributed=True"):
        exports.export_graph_csv(g, str(tmp_path / "g.csv"), max_local_rows=1)
    # opt-out (<=0) and distributed mode both still work
    exports.export_nodes_json(g, None, str(tmp_path / "n2.json"), max_local_rows=0)
    exports.export_nodes_json(
        g, None, str(tmp_path / "n3"), distributed=True, max_local_rows=1
    )


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


# ------------------------------------------------------------------- codecs
def test_bmp_roundtrip_pixel_exact():
    px = lambda x, y: ((x * 7 + y) % 256, (y * 5) % 256, (x + y * 3) % 256)
    data = codecs.encode_bmp(13, 9, px)  # odd width exercises row padding
    d = codecs.decode_bmp(data)
    assert (d["width"], d["height"]) == (13, 9)
    assert d["pixels"] == [px(x, y) for y in range(9) for x in range(13)]


def test_ppm_roundtrip_and_comment_header():
    px = lambda x, y: (x % 256, y % 256, (x ^ y) % 256)
    data = codecs.encode_ppm(10, 6, px)
    # inject a comment into the header — the grammar allows it
    data = data.replace(b"P6\n", b"P6\n# test comment\n", 1)
    d = codecs.decode_ppm(data)
    assert (d["width"], d["height"]) == (10, 6)
    assert d["pixels"] == [px(x, y) for y in range(6) for x in range(10)]


def test_wav_roundtrip_params_and_rms():
    data = codecs.encode_wav(800, 8000, lambda i: 1000 if i % 2 else -1000)
    d = codecs.decode_wav(data)
    assert d["n_channels"] == 1 and d["sample_rate"] == 8000
    assert d["n_frames"] == 800 and abs(d["duration_s"] - 0.1) < 1e-12
    assert abs(d["rms"] - 1000.0) < 1e-9  # constant magnitude → rms == |s|


def test_decode_image_rejects_external_codec_formats():
    import pytest

    with pytest.raises(codecs.UnsupportedMediaError):
        codecs.decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 64)  # JPEG magic


def test_png_roundtrip_all_filters_pixel_exact():
    def pf(x, y):
        return ((x * 7 + y * 13) % 256, (x * 3 + y * 5) % 256, (x * 11 + y * 3) % 256)

    for w, h in [(1, 1), (8, 8), (16, 14), (5, 3)]:
        for ft in range(5):  # None/Sub/Up/Average/Paeth scanline filters
            data = codecs.encode_png(w, h, pf, filter_type=ft)
            d = codecs.decode_png(data)
            assert (d["width"], d["height"]) == (w, h)
            assert d["pixels"] == [pf(x, y) for y in range(h) for x in range(w)]
            # stored-block zlib keeps the size closed-form (oracle side)
            assert len(data) == 68 + (3 * w + 1) * h


def test_png_color_types_and_rejects():
    import struct
    import zlib

    import pytest

    def build(ctype, width, height, raw_rows, plte=None, depth=8, interlace=0):
        ihdr = struct.pack(">IIBBBBB", width, height, depth, ctype, 0, 0, interlace)
        raw = b"".join(b"\x00" + bytes(r) for r in raw_rows)
        out = codecs._PNG_SIG + codecs._png_chunk(b"IHDR", ihdr)
        if plte:
            out += codecs._png_chunk(b"PLTE", bytes(plte))
        return out + codecs._png_chunk(b"IDAT", zlib.compress(raw)) + codecs._png_chunk(
            b"IEND", b""
        )

    assert codecs.decode_png(build(0, 2, 2, [[10, 20], [30, 40]]))["pixels"] == [
        (10, 10, 10), (20, 20, 20), (30, 30, 30), (40, 40, 40)
    ]  # grayscale
    assert codecs.decode_png(
        build(3, 2, 1, [[1, 0]], plte=[255, 0, 0, 0, 255, 0])
    )["pixels"] == [(0, 255, 0), (255, 0, 0)]  # palette
    assert codecs.decode_png(build(4, 2, 1, [[7, 255, 9, 0]]))["pixels"] == [
        (7, 7, 7), (9, 9, 9)
    ]  # gray+alpha (alpha dropped)
    assert codecs.decode_png(build(6, 1, 1, [[1, 2, 3, 200]]))["pixels"] == [(1, 2, 3)]
    with pytest.raises(codecs.UnsupportedMediaError):  # 16-bit depth
        codecs.decode_png(build(2, 1, 1, [[0] * 6], depth=16))
    with pytest.raises(codecs.UnsupportedMediaError):  # Adam7
        codecs.decode_png(build(2, 1, 1, [[0] * 3], interlace=1))


# ---------------------------------------------------------------- multimodal
def test_media_image_features_real_decode(spark):
    media = mm.synthetic_media(spark, n=12)
    feats = {r["media_id"]: r for r in mm.image_features(media).collect()}
    assert len(feats) == 12
    for seq in range(12):
        r = feats[f"m{seq:06d}"]
        kind = ["bmp", "wav", "ppm", "png"][seq % 4]
        if kind in ("bmp", "ppm", "png"):
            w, h = mm._image_dims(seq)
            assert (r["width"], r["height"]) == (w, h)
            # phash must equal the one computed directly from the raster
            expect = codecs.average_hash(
                w, h, [mm._image_pixel(seq, x, y) for y in range(h) for x in range(w)]
            )
            assert r["phash"] == expect
        else:  # wav payloads are not decodable images → null row
            assert r["width"] is None and r["phash"] is None


def test_media_phash_near_dup_pairs_full_stack(spark):
    """bmpv variant family → REAL encode/decode → average-hash →
    Hamming-banded pairs must equal the Python brute force, and the
    engineered intra-group near-dups must actually be found."""
    from pyspark.sql import functions as F

    from graph_loom_spark.ops import dedup as ops_dedup

    n = 40
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    media = mm.media_from_documents(docs, kind="bmpv")
    hi = F.conv(F.substring("phash", 1, 8), 16, 10).cast("bigint")
    lo = F.conv(F.substring("phash", 9, 8), 16, 10).cast("bigint")
    sig = mm.image_features(media).select(
        "media_id", F.shiftleft(hi, 32).bitwiseOR(lo).alias("simhash")
    )
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in ops_dedup.simhash_near_pairs(
            sig, id_col="media_id", max_hamming=3
        ).collect()
    }

    def phash(seq):
        base, member = seq - seq % 4, seq % 4
        w, h = mm._image_dims(base)
        return int(
            codecs.average_hash(
                w,
                h,
                [mm._variant_pixel(base, member, x, y) for y in range(h) for x in range(w)],
            ),
            16,
        )

    hs = {s: phash(s) for s in range(n)}
    want = {
        (f"m{a:012d}", f"m{b:012d}", bin(hs[a] ^ hs[b]).count("1"))
        for a in range(n)
        for b in range(a + 1, n)
        if bin(hs[a] ^ hs[b]).count("1") <= 3
    }
    assert got == want
    # the variant family engineers real near-dups: some intra-group pair
    # at Hamming 1-3 (not just identical-raster Hamming-0 pairs)
    assert any(
        0 < h2 <= 3 and int(a[1:]) // 4 == int(b[1:]) // 4 for a, b, h2 in got
    )


def test_media_audio_fingerprint_pairs_full_stack(spark):
    """wavv variant family → REAL PCM encode/decode → energy
    fingerprint → Hamming-banded pairs must equal the Python brute
    force, with real intra-group near-dups found."""
    from pyspark.sql import functions as F

    from graph_loom_spark.ops import dedup as ops_dedup

    n = 40
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    media = mm.media_from_documents(docs, kind="wavv")
    hi = F.conv(F.substring("fp", 1, 8), 16, 10).cast("bigint")
    lo = F.conv(F.substring("fp", 9, 8), 16, 10).cast("bigint")
    sig = mm.audio_fingerprint(media).select(
        "media_id", F.shiftleft(hi, 32).bitwiseOR(lo).alias("simhash")
    )
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in ops_dedup.simhash_near_pairs(
            sig, id_col="media_id", max_hamming=3
        ).collect()
    }

    def fp(seq):
        base, member = seq - seq % 4, seq % 4
        nf = mm._wav_frames(base)
        samples = [
            ((i * (base + 3)) % 97 - 48) * 100 + (400 if i % 61 < member else 0)
            for i in range(nf)
        ]
        return int(codecs.energy_fingerprint(samples), 16)

    hs = {s: fp(s) for s in range(n)}
    want = {
        (f"m{a:012d}", f"m{b:012d}", bin(hs[a] ^ hs[b]).count("1"))
        for a in range(n)
        for b in range(a + 1, n)
        if bin(hs[a] ^ hs[b]).count("1") <= 3
    }
    assert got == want
    assert any(
        0 < h2 <= 3 and int(a[1:]) // 4 == int(b[1:]) // 4 for a, b, h2 in got
    )


def test_media_audio_features_real_decode(spark):
    media = mm.synthetic_media(spark, n=12)
    rows = {r["media_id"]: r for r in mm.audio_features(media).collect()}
    for seq in range(12):
        r = rows[f"m{seq:06d}"]
        if seq % 4 == 1:  # wav rows
            assert r["sample_rate"] == 8000
            assert r["n_frames"] == mm._wav_frames(seq)
            assert abs(r["duration_s"] - r["n_frames"] / 8000.0) < 1e-12
            assert r["rms"] > 0
        else:
            assert r["sample_rate"] is None


def test_media_resize_real_downsample(spark):
    media = mm.synthetic_media(spark, n=8)
    out = mm.resize_images(media, max_side=4)
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in media.schema.fields
    ]
    for r in out.collect():
        kind = r["meta"]["kind"]
        if kind in ("bmp", "ppm", "png"):
            d = codecs.decode_bmp(bytes(r["data"]))  # re-encoded as BMP
            assert max(d["width"], d["height"]) <= 4
            assert r["meta"]["resized_max_side"] == "4"
            assert r["mime"] == "image/bmp"
        else:
            assert r["meta"].get("resize_skipped") == "1"
        assert r["meta"]["source"] == "synthetic"


def test_y4m_roundtrip_and_rgb():
    def pf(f, x, y):
        return ((f * 31 + x * 7 + y * 13) % 256, (f * 17 + x * 3 + y * 5) % 256,
                (f * 7 + x * 11 + y * 3) % 256)

    data = codecs.encode_y4m(8, 6, 4, pf)
    d = codecs.demux_y4m(data)
    assert (d["width"], d["height"], len(d["frames"])) == (8, 6, 4)
    # Y plane is exact BT.601 integer math per pixel
    ys = d["frames"][2][: 8 * 6]
    for y in range(6):
        for x in range(8):
            r, g, b = pf(2, x, y)
            assert ys[y * 8 + x] == (77 * r + 150 * g + 29 * b) >> 8
    # RGB reconstruction is bounded by chroma subsampling, not broken
    rgb = codecs.yuv420_frame_to_rgb(d["frames"][2], 8, 6)
    orig = [pf(2, x, y) for y in range(6) for x in range(8)]
    assert len(rgb) == 48
    assert max(abs(a - b) for p, q in zip(rgb, orig) for a, b in zip(p, q)) <= 64


def test_mjpeg_demux_roundtrip():
    import pytest

    mj = codecs.encode_mjpeg([b"\x01\x02\x03", b"", b"\x7f" * 10])
    frames = codecs.demux_mjpeg(mj)["frames"]
    assert len(frames) == 3
    assert frames[0] == b"\xff\xd8\x01\x02\x03\xff\xd9"
    with pytest.raises(codecs.UnsupportedMediaError):  # MP4 = external seam
        codecs.demux_video(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 32)


def test_media_sample_frames_real_demux(spark):
    media = mm.synthetic_videos(spark, n=16)
    frames = mm.sample_frames(media, every_n=2, max_frames=3).collect()
    per_id: dict[str, int] = {}
    for r in frames:
        per_id[r["media_id"]] = per_id.get(r["media_id"], 0) + 1
    for seq in range(16):
        mid = f"v{seq:06d}"
        if seq % 8 == 7:  # mp4: external demuxer seam -> no rows
            assert mid not in per_id
            continue
        w, h, nf = mm._video_dims(seq)
        assert per_id[mid] == min(3, (nf + 1) // 2)
    # y4m frames are the raw C420 planes with the exact plane size
    for r in frames:
        seq = int(r["media_id"][1:])
        if seq % 8 != 7 and seq % 2 == 0:
            w, h, _ = mm._video_dims(seq)
            assert len(r["frame"]) == w * h * 3 // 2
            assert r["frame_index"] % 2 == 0
    # and they decode: phash the first frame of v000000
    w, h, _ = mm._video_dims(0)
    first = next(bytes(r["frame"]) for r in frames if r["media_id"] == "v000000" and r["frame_index"] == 0)
    rgb = codecs.yuv420_frame_to_rgb(first, w, h)
    assert len(codecs.average_hash(w, h, rgb)) == 16


def test_media_stats(spark):
    media = mm.synthetic_media(spark, n=8)
    stats = {r["mime"]: r for r in mm.media_stats(media).collect()}
    assert set(stats) == {
        "image/bmp", "audio/wav", "image/x-portable-pixmap", "image/png"
    }
    assert all(r["n_items"] == 2 for r in stats.values())
    assert all(r["total_bytes"] > 0 for r in stats.values())
