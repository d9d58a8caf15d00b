"""S11 query-log sink: timestamp | status + query text appended per call
(query_interface.rs:28-52)."""

from __future__ import annotations

import glob

from graph_loom_spark.interface import log_query
from graph_loom_spark.result import QueryOutcome


def test_log_query_ok_and_err(tmp_path):
    d = str(tmp_path / "logs")
    out = QueryOutcome(rows=[], affected_nodes=2, affected_relationships=1, mutated=True)
    log_query("CREATE (n:X)", out, None, d)
    log_query("BROKEN", None, "parse error", d)
    [path] = glob.glob(f"{d}/queries_*.log")
    text = open(path).read()
    assert "OK mutated=true nodes=2 rels=1" in text
    assert "CREATE (n:X)" in text
    assert "ERR parse error" in text
    assert "BROKEN" in text
