"""V2 WebSocket REPL: contract parity with the reference's GET /api/repl
(server.rs:179-230 — banner, pretty-JSON replies, error text, ping/pong)
over a real socket using the stdlib RFC 6455 implementation."""

from __future__ import annotations

import json

import pytest

from graph_loom_spark import ws as wsproto
from graph_loom_spark.graph import PropertyGraph
from graph_loom_spark.interface import CypherSession
from graph_loom_spark.serve import REPL_BANNER, QueryServer
from graph_loom_spark.ws import WebSocketClient


@pytest.fixture()
def server(spark, tmp_path):
    sess = CypherSession(PropertyGraph.empty(spark))
    qs = QueryServer(sess, api_key="sekrit", timeout_s=120, ws_timeout_s=120,
                     log_dir=str(tmp_path / "logs"))
    httpd = qs.serve(port=0)
    yield ("127.0.0.1", httpd.server_address[1])
    httpd.shutdown()


def test_repl_roundtrip(server):
    host, port = server
    with WebSocketClient(host, port, api_key="sekrit") as c:
        assert c.recv_text() == REPL_BANNER  # banner first (glsh.rs skips it)

        c.send_text('CREATE (p:Person {name:"Neo"})')
        out = json.loads(c.recv_text())
        # Cypher-path mutations report counts 0,0 like the reference
        # (query_interface.rs:118); mutated flag is the signal
        assert out["mutated"] is True

        c.send_text("MATCH (p:Person) RETURN p")
        out = json.loads(c.recv_text())
        [row] = out["rows"]
        assert row["kind"] == "node"
        assert row["label"] == "Person"
        assert row["metadata"] == {"name": "Neo"}


def test_repl_error_text_and_ping(server):
    host, port = server
    with WebSocketClient(host, port, api_key="sekrit") as c:
        c.recv_text()  # banner

        # execution failure → "error: ..." text (ReplWs ctx.text)
        c.send_text("THIS IS NOT A QUERY")
        assert c.recv_text().startswith("error: ")

        # ping → pong with same payload
        c.sock.sendall(wsproto.encode_frame(wsproto.OP_PING, b"hb", mask=True))
        op, payload = wsproto.read_message(c.rfile)
        assert op == wsproto.OP_PONG and payload == b"hb"

        # empty input → no reply; next query still answered in order
        c.send_text("   ")
        c.send_text("MATCH (n:Nothing) RETURN n")
        out = json.loads(c.recv_text())
        assert out["rows"] == []


def test_repl_auth_required(server):
    host, port = server
    with pytest.raises(ConnectionError, match="401"):
        WebSocketClient(host, port, api_key="wrong")


class _SlowSession:
    """Stand-in whose queries outlive the server budget."""

    def execute_and_log(self, query, params=None, log_dir=None):
        import time

        time.sleep(2.0)
        raise AssertionError("should have timed out first")

    execute = execute_and_log


def test_repl_timeout_text(tmp_path):
    qs = QueryServer(_SlowSession(), ws_timeout_s=0.2, log_dir=str(tmp_path))
    httpd = qs.serve(port=0)
    try:
        with WebSocketClient("127.0.0.1", httpd.server_address[1]) as c:
            c.recv_text()  # banner
            c.send_text("MATCH (n) RETURN n")
            assert c.recv_text() == "timeout"  # ReplWs Err(_) → ctx.text("timeout")
    finally:
        httpd.shutdown()


def test_http_timeout_504(tmp_path):
    import urllib.error
    import urllib.request

    qs = QueryServer(_SlowSession(), timeout_s=0.2, log_dir=str(tmp_path))
    httpd = qs.serve(port=0)
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{httpd.server_address[1]}/api/query",
            data=json.dumps({"query": "MATCH (n) RETURN n"}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 504
        assert ei.value.read().decode() == "query timeout"  # server.rs:174
    finally:
        httpd.shutdown()
