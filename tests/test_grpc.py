"""V3 gRPC layer: proto3 wire-codec conformance (always runs — the codec
is pure Python) and a real grpcio round-trip (skipped when grpcio is not
installed, as in the test container)."""

from __future__ import annotations

import pytest

from graph_loom_spark import grpc_codec as codec
from graph_loom_spark.grpc_serve import outcome_to_response
from graph_loom_spark.result import QueryOutcome, ResultRow

# ------------------------------------------------------------- wire vectors
# Hand-computed from the proto3 spec (field << 3 | wire_type, varint
# lengths) so the codec is checked against the wire format itself, not
# against its own inverse.


def test_request_known_bytes():
    data = codec.encode_query_request("MATCH", {"a": "1"}, log=True)
    expected = bytes(
        [0x0A, 0x05, *b"MATCH"]  # field 1: "MATCH"
        + [0x12, 0x06, 0x0A, 0x01, *b"a", 0x12, 0x01, *b"1"]  # field 2 map {a:1}
        + [0x18, 0x01]  # field 3: true
    )
    assert data == expected


def test_response_known_bytes():
    resp = {
        "rows": [{"info": "hi"}],
        "affected_nodes": 1,
        "affected_relationships": 300,  # 2-byte varint: 0xAC 0x02
        "mutated": True,
        "error": "",
    }
    data = codec.encode_query_response(resp)
    expected = bytes(
        [0x0A, 0x04, 0x1A, 0x02, *b"hi"]  # row { info: "hi" } (oneof field 3)
        + [0x10, 0x01]  # affected_nodes = 1
        + [0x18, 0xAC, 0x02]  # affected_relationships = 300
        + [0x20, 0x01]  # mutated = true
        # error "" omitted (plain proto3 scalar)
    )
    assert data == expected


def test_proto3_scalar_defaults_omitted():
    assert codec.encode_query_request("", {}, log=False) == b""
    # ...but a oneof member is emitted even when its value is empty
    row = codec._encode_row({"info": ""})
    assert row == bytes([0x1A, 0x00])
    assert codec._decode_row(row) == {"info": ""}


# --------------------------------------------------------------- round trips


def test_request_roundtrip():
    req = {
        "query": "MATCH (p:Person {name:$who}) RETURN p " + "x" * 200,  # >127 len
        "params": {"who": "Néo", "β": "2"},
        "log": True,
    }
    assert codec.decode_query_request(
        codec.encode_query_request(req["query"], req["params"], req["log"])
    ) == req


def test_response_roundtrip_all_row_kinds():
    resp = {
        "rows": [
            {"node": {"id": "n1", "label": "Person", "metadata": {"name": "Neo", "k": ""}}},
            {
                "relationship": {
                    "id": "r1",
                    "from_id": "n1",
                    "to_id": "n2",
                    "label": "KNOWS",
                    "metadata": {},
                }
            },
            {"info": "42"},
        ],
        "affected_nodes": 2,
        "affected_relationships": 1,
        "mutated": True,
        "error": "boom",
    }
    assert codec.decode_query_response(codec.encode_query_response(resp)) == resp


def test_outcome_mapping_matches_grpc_rs_shapes():
    out = QueryOutcome(
        rows=[
            ResultRow.node("n1", "Person", {"name": "Neo"}),
            ResultRow.rel("r1", "n1", "n2", "KNOWS", {}),
            ResultRow.info_row("7"),
        ],
        affected_nodes=1,
        affected_relationships=2,
        mutated=True,
    )
    resp = outcome_to_response(out)
    assert resp["error"] == ""
    assert resp["rows"][0]["node"]["metadata"] == {"name": "Neo"}
    assert resp["rows"][1]["relationship"]["from_id"] == "n1"
    assert resp["rows"][2] == {"info": "7"}


# ------------------------------------------------------- live channel (opt)


def test_grpc_roundtrip_real_channel(spark, tmp_path):
    pytest.importorskip(
        "grpc",
        reason="grpcio not installed — see README.md 'gRPC service (V3): "
        "running with a real grpc stack' for how to run this live "
        "round-trip end-to-end",
    )
    from graph_loom_spark.graph import PropertyGraph
    from graph_loom_spark.grpc_serve import GraphQueryClient, serve_grpc
    from graph_loom_spark.interface import CypherSession
    from graph_loom_spark.serve import QueryServer

    sess = CypherSession(PropertyGraph.empty(spark))
    broker = QueryServer(sess, api_key="sekrit", timeout_s=120, log_dir=str(tmp_path))
    server = serve_grpc(broker, port=0)  # ephemeral port
    try:
        with GraphQueryClient(f"localhost:{server.bound_port}", api_key="sekrit") as c:
            out = c.execute('CREATE (p:Person {name:"Neo"})')
            assert out["mutated"] is True
            out = c.execute("MATCH (p:Person) RETURN p")
            [row] = out["rows"]
            assert row["node"]["label"] == "Person"
            out = c.execute("NOT A QUERY")
            assert out["error"]  # in-band, like grpc.rs:88-94
    finally:
        server.stop(0)
