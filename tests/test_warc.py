"""WARC container ingest (ops/warc.py, VERDICT r12 ask #3): the
record splitter's byte rules (Content-Length delimiting, folded
headers, salvage on corrupt length, gzip members), the HTTP peel, and
the write → binaryFile → split roundtrip the docs_warc_extract oracle
relies on."""

from __future__ import annotations

import gzip
import importlib.util
import os

from graph_loom_spark.ops.warc import (
    http_parts,
    split_warc,
    warc_records,
    write_warc,
)

SF_DIR = "/root/testdata/sf0.001"

_spec = importlib.util.spec_from_file_location(
    "spark_entry_warc",
    os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py"),
)
_entry = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_entry)


def _record(wtype: str, payload: bytes, extra: str = "") -> bytes:
    return (
        (
            "WARC/1.0\r\n"
            f"WARC-Type: {wtype}\r\n"
            f"{extra}"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode("ascii")
        + payload
        + b"\r\n\r\n"
    )


def test_split_warc_content_length_slices_through_embedded_magic():
    """A crawled page QUOTING a WARC file must not split the record:
    Content-Length delimits the payload, magic-scanning does not."""
    nasty = b"<p>example: WARC/1.0\r\nWARC-Type: response\r\n\r\ngotcha</p>"
    blob = _record("response", nasty) + _record("metadata", b"tail")
    recs = split_warc(blob)
    assert [r[1]["warc-type"] for r in recs] == ["response", "metadata"]
    assert recs[0][2] == nasty
    assert recs[1][2] == b"tail"


def test_split_warc_folded_header_continuation():
    blob = _record(
        "response",
        b"x",
        extra="WARC-Target-URI: https://example.org/a\r\n\tvery/long/path\r\n",
    )
    (_, hdr, payload) = split_warc(blob)[0]
    assert hdr["warc-target-uri"] == "https://example.org/a very/long/path"
    assert payload == b"x"


def test_split_warc_salvages_after_corrupt_content_length():
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: oops\r\n\r\n"
        b"some payload of unknown length"
        b"\r\n\r\n"
    )
    blob = bad + _record("response", b"clean")
    recs = split_warc(blob)
    assert len(recs) == 2
    assert recs[0][2] == b"some payload of unknown length"
    assert recs[1][2] == b"clean"


def test_split_warc_gzip_members():
    r1 = _record("response", b"alpha")
    r2 = _record("response", b"beta")
    blob = gzip.compress(r1) + gzip.compress(r2)  # per-record members
    recs = split_warc(blob)
    assert [r[2] for r in recs] == [b"alpha", b"beta"]


def test_http_parts_peels_envelope_and_passes_raw_through():
    body = "<html>é</html>".encode("utf-8")
    payload = (
        b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\n" + body
    )
    status, ctype, got = http_parts(payload)
    assert (status, ctype, got) == (404, "text/html", body)
    assert http_parts(b"not http at all") == (None, None, b"not http at all")


def test_write_read_roundtrip_byte_exact(spark, tmp_path):
    """write_warc → binaryFile → warc_records reproduces every page
    byte-exactly, including multi-byte UTF-8 (Content-Length counts
    BYTES) and CRLFs inside the body."""
    pages = spark.createDataFrame(
        [
            (0, "https://a.example/0", "<p>plain</p>"),
            (1, "https://b.example/1", "<p>café 中文</p>"),
            (8, "https://a.example/8", "<p>crlf\r\ninside</p>"),
        ],
        "doc_id long, url string, html string",
    )
    path = str(tmp_path / "warc")
    write_warc(pages, path, shards=2)
    files = spark.read.format("binaryFile").load(path)
    recs = warc_records(files)
    rows = recs.collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["warc_type"], []).append(r)
    assert len(by_type["warcinfo"]) == 2  # one per shard file
    resp = {r["record_id"]: r for r in by_type["response"]}
    assert set(resp) == {"<urn:gls:0>", "<urn:gls:1>", "<urn:gls:8>"}
    assert bytes(resp["<urn:gls:1>"]["payload"]).decode("utf-8") == (
        "<p>café 中文</p>"
    )
    assert bytes(resp["<urn:gls:8>"]["payload"]) == b"<p>crlf\r\ninside</p>"
    assert all(r["http_status"] == 200 for r in resp.values())
    assert resp["<urn:gls:0>"]["target_uri"] == "https://a.example/0"
    # shard 0 file holds ids 0 and 8 in id order after its warcinfo
    f0 = [r for r in rows if r["path"].endswith("part-00000.warc")]
    assert [r["record_idx"] for r in sorted(f0, key=lambda r: r["record_idx"])] == [0, 1, 2]


def test_docs_warc_extract_entry_matches_html_extract(spark):
    """The registry entry end to end at sf0.001: the WARC path must
    extract the SAME text the direct html_extract path produces for
    the same generated pages — the container layer adds transport,
    never content."""
    from pyspark.sql import functions as F

    from graph_loom_spark.ops import html as ops_html

    out = {
        r["doc_id"]: r
        for r in _entry.queries()["docs_warc_extract"](spark, SF_DIR).collect()
    }
    direct = {
        r["doc_id"]: r
        for r in ops_html.html_extract(
            _entry._web_docs(spark, SF_DIR)
        ).collect()
    }
    assert set(out) == set(direct)
    for did, r in out.items():
        assert r["text"] == direct[did]["text"]
        assert r["n_blocks"] == direct[did]["n_blocks"]
        assert r["http_status"] == 200
        assert r["target_uri"].endswith(f"/d/{did}")
