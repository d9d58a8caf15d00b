"""The examples/retrieval_pipeline.py composition must run end-to-end on
the tiny fixture with a sane fused ranking and a leakage-safe split."""

from __future__ import annotations

import sys

sys.path.insert(0, "examples")

SF_DIR = "/root/testdata/sf0.001"


def test_retrieval_pipeline_end_to_end(spark):
    from retrieval_pipeline import run_retrieval

    fused, info = run_retrieval(spark, SF_DIR, k=5)
    rows = fused.collect()
    assert 0 < len(rows) <= 5
    # fused scores are int64 micropoints, monotonically non-increasing
    scores = [r["rrf_micro"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(isinstance(s, int) and s > 0 for s in scores)
    # both lanes produced candidates; a doc retrieved by both lanes (if
    # any) carries n_lists == 2
    assert info["bm25_candidates"] > 0 and info["dense_candidates"] > 0
    # the tight-memory BQ+rescore lane runs and overlaps sanely
    assert 0 <= info["bq_rerank_overlap_with_ivf"] <= 5
    assert all(r["n_lists"] in (1, 2) for r in rows)
    # split covers the corpus
    assert sum(info["split_sizes"].values()) == info["corpus_docs"]
