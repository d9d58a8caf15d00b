"""X159 web_host_rank — the host-level web-graph curation screen
(VERDICT r12 ask #2): parsed link records → href host extraction →
host→host edges → fixed-point PageRank → per-host quality rollup.
The oracle hash is the primary gate (scripts/check_oracle.py); these
tests pin the composition invariants and the plan shape."""

from __future__ import annotations

import importlib.util
import os

SF_DIR = "/root/testdata/sf0.001"

_spec = importlib.util.spec_from_file_location(
    "spark_entry_webgraph",
    os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py"),
)
_entry = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_entry)


def test_web_host_rank_invariants(spark):
    """Structural invariants of the host-graph composition at sf0.001:
    every source host serves its docs, the hub is a pageless dangling
    node with NULL quality, in-links account for exactly the 3 links
    per page, and fixed-point ranks sum to ~1 (floor-division drops
    at most ~|E|/1e12 of mass)."""
    rows = _entry.queries()["web_host_rank"](spark, SF_DIR).collect()
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n_docs = docs.count()
    by_host = {r["host"]: r for r in rows}

    hub = by_host["www.hub.example"]
    assert hub["n_pages"] == 0
    assert hub["sum_quality"] is None
    assert hub["mean_quality_milli"] is None
    # every page links to the hub once → n_docs in-links (plus none out)
    assert hub["n_in_links"] == n_docs

    assert sum(r["n_pages"] for r in rows) == n_docs
    assert sum(r["n_in_links"] for r in rows) == 3 * n_docs
    total_rank = sum(r["rank"] for r in rows)
    assert 0.99 <= total_rank <= 1.0 + 1e-9
    # the hub receives a link from EVERY page but links out to nobody:
    # it must out-rank every source host (they split the remaining mass)
    assert hub["rank"] == max(r["rank"] for r in rows)
    # mean is the exact integer milli ratio of the reported columns
    for r in rows:
        if r["n_pages"]:
            assert r["mean_quality_milli"] == (1000 * r["sum_quality"]) // r["n_pages"]


def test_web_links_href_hosts_match_construction(spark):
    """The PARSED href stream must reproduce the generated link
    multiset exactly: per doc (own-host root, target-host /d/ link,
    hub /search) — a drop or mangle anywhere in generate → parse →
    regexp host-extract breaks this."""
    from pyspark.sql import functions as F

    links = _entry._web_links(spark, SF_DIR)
    got = {
        (r["doc_id"], r["link_pos"], r["href"])
        for r in links.collect()
    }
    docs = {
        r["doc_id"]: r["source"]
        for r in spark.read.parquet(
            os.path.join(SF_DIR, "documents.parquet")
        ).collect()
    }
    expected = set()
    for did, src in docs.items():
        h = f"www.{(src or '').lower()}.example"
        tid = did // 7
        th = f"www.{(docs.get(tid, '') or '').lower()}.example"
        expected.add((did, 1, f"https://{h}/"))
        expected.add((did, 2, f"https://{th}/d/{tid}"))
        expected.add((did, 3, "https://www.hub.example/search"))
    assert got == expected
    # and the host regexp pulls exactly the authority component
    hosts = (
        links.select(
            F.regexp_extract(F.col("href"), "^https?://([^/?#]+)", 1).alias("h")
        )
        .distinct()
        .collect()
    )
    assert all(r["h"] and "/" not in r["h"] for r in hosts)
