"""HTTP serving layer: contract parity with the reference's POST
/api/query (auth, DTO shape, in-band execution errors)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from graph_loom_spark.graph import PropertyGraph
from graph_loom_spark.interface import CypherSession
from graph_loom_spark.serve import QueryServer


@pytest.fixture()
def server(spark, tmp_path):
    sess = CypherSession(PropertyGraph.empty(spark))
    qs = QueryServer(sess, api_key="sekrit", timeout_s=120, log_dir=str(tmp_path / "logs"))
    httpd = qs.serve(port=0)  # ephemeral port
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _post(base, body, key="sekrit"):
    req = urllib.request.Request(
        f"{base}/api/query",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json", **({"X-API-Key": key} if key else {})},
        method="POST",
    )
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read())


def test_auth_required(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server, {"query": "MATCH (n:X) RETURN n"}, key=None)
    assert ei.value.code == 401


def test_query_roundtrip_dto_shape(server):
    code, out = _post(server, {"query": 'CREATE (p:Person {name:"Neo"})'})
    assert code == 200
    assert out["mutated"] is True

    code, out = _post(
        server, {"query": "MATCH (p:Person {name:$n}) RETURN p", "params": {"n": "Neo"}}
    )
    assert code == 200
    assert out["affected_nodes"] == 0
    [row] = out["rows"]
    assert row["kind"] == "node"
    assert row["label"] == "Person"
    assert row["metadata"] == {"name": "Neo"}


def test_execution_error_400_text(server):
    # server.rs handle_query: Ok(Err(e)) → HttpResponse::BadRequest().body(e)
    try:
        _post(server, {"query": "THIS IS NOT A QUERY"})
        raise AssertionError("expected HTTPError")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        body = e.read().decode()
        assert body  # error text in the body, not JSON
        assert not body.startswith("{")


def test_bad_request(server):
    code_out = None
    try:
        _post(server, {"params": {"x": "y"}})
    except urllib.error.HTTPError as e:
        code_out = e.code
    assert code_out == 400
