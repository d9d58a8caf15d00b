"""The graph-analytics worked example runs end-to-end and is
deterministic: two invocations produce identical scalars and the same
top predicted links (everything underneath is integer/fixed-point)."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def test_graph_pipeline_end_to_end_deterministic(spark):
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graph_example",
        os.path.join(os.path.dirname(__file__), "..", "examples",
                     "graph_analytics_pipeline.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    a = mod.run_pipeline(spark, SF_DIR, link_k=5)
    b = mod.run_pipeline(spark, SF_DIR, link_k=5)
    assert a == b
    assert a["n_edges"] > 0
    assert len(a["top_links"]) == 5
    assert -1.0 <= a["assortativity"] <= 1.0
    assert 0.0 <= a["avg_clustering"] <= 1.0
