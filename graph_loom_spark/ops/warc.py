"""WARC container ingest — raw-crawl ingestion for the web pipeline.

Real web corpora (CommonCrawl and every in-house crawler since) ship
as WARC: a container of length-prefixed records — ``warcinfo`` file
metadata, ``request``/``response`` HTTP captures — each with CRLF
headers and a ``Content-Length``-delimited payload (ISO 28500).  The
HTML family (ops/html.py, X155-X157) starts from an HTML *column*;
this module completes the story upstream: point ``binaryFile`` at a
crawl directory, split containers into records, peel the HTTP
envelope, and feed the body straight into :func:`html_extract` —
CommonCrawl end to end (VERDICT r12 ask #3).

Same stdlib-only contract as the media codecs: the record splitter is
a pure function of the container bytes (``split_warc``), pinned
byte-exact by planted fixtures (payloads containing ``WARC/1.0``
text, folded continuation headers, missing/garbled Content-Length,
per-record gzip members), and the Spark surface is an Arrow-batched
``mapInPandas`` over the ``binaryFile`` FileFormat — directory
listing, partition planning and the binary scan all JVM-side, one
file per task, so a 100 TB crawl parallelizes by container count
(CommonCrawl containers are ~1 GB — the natural task size; Spark's
``binaryFile`` 2 GB row cap is respected by the format itself).

The distributed writer (``write_warc``) is the fixture side of the
oracle trick: deterministic record assembly (sorted ids per shard,
fixed WARC-Date, byte-counted Content-Length over the UTF-8 payload)
written from executors via ``applyInPandas`` — so generate → write →
binaryFile → split → HTTP-peel → html_extract is replayable from the
base parquet by a SQL oracle, and a drop or mangle anywhere in the
chain breaks the hash.
"""

from __future__ import annotations

import os
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF2 = b"\r\n\r\n"


def _gunzip_members(data: bytes) -> bytes:
    """Concatenate all gzip members (WARC spec: each record MAY be an
    independent gzip member; CommonCrawl .warc.gz files are exactly
    that). Garbage after the last complete member is ignored."""
    out = []
    d = data
    while d[:2] == b"\x1f\x8b":
        obj = zlib.decompressobj(wbits=31)
        try:
            out.append(obj.decompress(d))
            out.append(obj.flush())
        except zlib.error:
            break
        d = obj.unused_data
    return b"".join(out)


def _parse_header_block(block: bytes) -> tuple[str, dict]:
    """Parse a CRLF header block → (version-line, {lower-name: value}).
    Folded continuation lines (leading SP/TAB — RFC 822 style, legal
    in WARC named fields) append to the previous field with a single
    space."""
    lines = block.decode("utf-8", "replace").split("\r\n")
    version = lines[0].strip()
    headers: dict = {}
    last = None
    for ln in lines[1:]:
        if ln[:1] in (" ", "\t") and last is not None:
            headers[last] = headers[last] + " " + ln.strip()
            continue
        name, sep, value = ln.partition(":")
        if not sep:
            continue
        last = name.strip().lower()
        headers[last] = value.strip()
    return version, headers


def split_warc(data: bytes) -> list[tuple[str, dict, bytes]]:
    """Split one WARC container into ``(version, headers, payload)``
    records — the pure core ``warc_records`` distributes.

    The payload is delimited by ``Content-Length`` (the WARC rule),
    NOT by scanning for the next magic — so a payload that itself
    contains ``WARC/1.0\\r\\n...`` text (crawled pages quoting WARC
    files exist) is sliced through, never split.  A record with a
    missing or non-numeric Content-Length falls back to scanning for
    the next ``\\r\\n\\r\\nWARC/`` boundary — the salvage rule, so one
    corrupt record never drops the rest of a 1 GB container.  Gzip
    containers (per-record members or one stream) are transparently
    decompressed."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    n = len(data)
    records = []
    pos = 0
    while True:
        i = data.find(b"WARC/", pos)
        if i < 0:
            break
        he = data.find(_CRLF2, i)
        if he < 0:
            break
        version, headers = _parse_header_block(data[i:he])
        body_start = he + 4
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            clen = -1
        if 0 <= clen and body_start + clen <= n:
            payload = data[body_start : body_start + clen]
            pos = body_start + clen
        else:
            j = data.find(b"\r\n\r\nWARC/", body_start)
            payload = data[body_start:j] if j >= 0 else data[body_start:]
            pos = (j + 4) if j >= 0 else n
        records.append((version, headers, payload))
    return records


def http_parts(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """Peel the HTTP response envelope off a ``response`` record
    payload → ``(status, content_type, body)``.  A payload that is not
    an HTTP message (no status line) comes back ``(None, None,
    payload)`` — the raw-resource record form."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    sep = payload.find(_CRLF2)
    head = payload[:sep] if sep >= 0 else payload
    body = payload[sep + 4 :] if sep >= 0 else b""
    _, headers = _parse_header_block(b"HTTP-STATUS-LINE\r\n" + head)
    first = head.split(b"\r\n", 1)[0].decode("ascii", "replace").split()
    status = None
    if len(first) >= 2 and first[1].isdigit():
        status = int(first[1])
    return status, headers.get("content-type"), body


WARC_RECORD_FIELDS = [
    T.StructField("record_idx", T.LongType(), False),
    T.StructField("warc_type", T.StringType(), True),
    T.StructField("record_id", T.StringType(), True),
    T.StructField("target_uri", T.StringType(), True),
    T.StructField("content_length", T.LongType(), True),
    T.StructField("http_status", T.LongType(), True),
    T.StructField("http_content_type", T.StringType(), True),
    T.StructField("payload", T.BinaryType(), True),
]


def warc_records(
    files: DataFrame,
    content_col: str = "content",
    path_col: str = "path",
) -> DataFrame:
    """Split a ``binaryFile`` frame of WARC containers into one row per
    record:

    ``(path, record_idx, warc_type, record_id, target_uri,
    content_length, http_status, http_content_type, payload)``

    where ``payload`` is the record body with the HTTP envelope
    ALREADY peeled for response records (``http_status`` /
    ``http_content_type`` carry the envelope; non-HTTP payloads pass
    through with NULL status).  ``record_idx`` is the record's
    0-based position in its container — with ``path`` it is the
    stable record identity a re-crawl diff joins on.

    Scale shape: one Arrow-batched ``mapInPandas`` over ``(path,
    content)`` — no shuffle; parallelism = container count (the
    production layout: thousands of ~1 GB containers per crawl).
    """
    schema = T.StructType(
        [T.StructField("path", T.StringType(), True)] + WARC_RECORD_FIELDS
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, blob in zip(pdf[path_col], pdf[content_col]):
                data = bytes(blob) if blob is not None else b""
                for idx, (_, hdr, payload) in enumerate(split_warc(data)):
                    wtype = hdr.get("warc-type")
                    status, ctype, body = (None, None, payload)
                    if (
                        wtype == "response"
                        and "application/http"
                        in (hdr.get("content-type") or "")
                    ):
                        status, ctype, body = http_parts(payload)
                    rows.append(
                        (
                            path,
                            idx,
                            wtype,
                            hdr.get("warc-record-id"),
                            hdr.get("warc-target-uri"),
                            int(hdr["content-length"])
                            if str(hdr.get("content-length", "")).isdigit()
                            else None,
                            status,
                            ctype,
                            body,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path",
                    "record_idx",
                    "warc_type",
                    "record_id",
                    "target_uri",
                    "content_length",
                    "http_status",
                    "http_content_type",
                    "payload",
                ],
            )

    return files.select(path_col, content_col).mapInPandas(run, schema)


def write_warc(
    pages: DataFrame,
    path: str,
    id_col: str = "doc_id",
    url_col: str = "url",
    html_col: str = "html",
    shards: int = 8,
) -> None:
    """Distributed deterministic WARC writer — the fixture/export side
    of the ingest seam: shard pages by ``id % shards``, assemble each
    shard's container on its executor (a ``warcinfo`` head record,
    then one HTTP ``response`` record per page in id order —
    ``Content-Length`` counts the UTF-8 payload BYTES, the rule the
    splitter relies on), and write ``part-<shard>.warc`` files.
    Deterministic: fixed WARC-Date, ids sorted within shard, record
    ids ``<urn:gls:<id>>`` — so a reader can be oracle-checked against
    the frame that was written.  Executors write to ``path`` directly
    (local FS here; an object-store mount on a cluster) — no driver
    collect, no single-writer bottleneck."""
    os.makedirs(path, exist_ok=True)
    n = int(shards)

    def emit(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        pdf = pdf.sort_values(id_col)
        info_payload = (
            f"software: graph-loom-spark warc writer\r\nshard: {shard}\r\n"
        ).encode("ascii")
        chunks = [
            b"WARC/1.0\r\n"
            b"WARC-Type: warcinfo\r\n"
            + f"WARC-Record-ID: <urn:gls:shard:{shard}>\r\n".encode("ascii")
            + b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
            b"Content-Type: application/warc-fields\r\n"
            + f"Content-Length: {len(info_payload)}\r\n\r\n".encode("ascii")
            + info_payload
            + b"\r\n\r\n"
        ]
        for _, row in pdf.iterrows():
            html_b = (row[html_col] or "").encode("utf-8")
            http = (
                b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/html; charset=utf-8\r\n"
                + f"Content-Length: {len(html_b)}\r\n\r\n".encode("ascii")
                + html_b
            )
            hdr = (
                "WARC/1.0\r\n"
                "WARC-Type: response\r\n"
                f"WARC-Record-ID: <urn:gls:{row[id_col]}>\r\n"
                "WARC-Date: 2026-01-01T00:00:00Z\r\n"
                f"WARC-Target-URI: {row[url_col]}\r\n"
                "Content-Type: application/http;msgtype=response\r\n"
                f"Content-Length: {len(http)}\r\n\r\n"
            ).encode("ascii")
            chunks.append(hdr + http + b"\r\n\r\n")
        blob = b"".join(chunks)
        fn = os.path.join(path, f"part-{shard:05d}.warc")
        tmp = fn + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, fn)  # readers never see a half-written container
        return pd.DataFrame(
            [(shard, len(pdf), len(blob))],
            columns=["shard", "n_records", "n_bytes"],
        )

    (
        pages.select(id_col, url_col, html_col)
        .withColumn("__shard", F.col(id_col) % n)
        .groupBy("__shard")
        .applyInPandas(emit, "shard long, n_records long, n_bytes long")
        .collect()
    )
