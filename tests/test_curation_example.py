"""The examples/curation_pipeline.py composition must run end-to-end on
the tiny fixture with a monotonically narrowing funnel."""

from __future__ import annotations

import sys

sys.path.insert(0, "examples")

SF_DIR = "/root/testdata/sf0.001"


def test_curation_pipeline_end_to_end(spark):
    from curation_pipeline import run_pipeline

    counts, mixed, packed, split = run_pipeline(spark, SF_DIR)
    # html ingest is row-preserving (every doc extracts, boilerplate
    # only drops BLOCKS) and the planted nav div is boiler in each page
    assert counts["after_html_extract"] == counts["ingested"]
    assert counts["boiler_blocks_dropped"] == counts["ingested"]
    assert (
        counts["ingested"]
        >= counts["after_quality"]
        >= counts["after_exact_dedup"]
        >= counts["after_near_dedup"]
        > counts["after_decontamination"]
        > counts["after_mixture"]
        > 0
    )
    # packing covers exactly the mixed docs; split partitions them
    assert counts["packed_docs"] == counts["after_mixture"]
    assert split.count() == counts["after_mixture"]
    names = {r["split"] for r in split.select("split").distinct().collect()}
    assert names <= {"train", "val", "test"}
    # deterministic: a rerun produces identical counts
    counts2, _, _, _ = run_pipeline(spark, SF_DIR)
    assert counts2 == counts
