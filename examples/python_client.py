"""Example gRPC client for the GraphQuery service (reference V6 parity:
examples/python_client/client.py — same call shape, same metadata auth).

Two ways to talk to the server:

1. This repo's built-in client (no protoc needed)::

       python examples/python_client.py

2. Classic protoc route — the server is wire-compatible with stubs
   generated from proto/graph_loom.proto::

       python -m grpc_tools.protoc -Iproto --python_out=. \
           --grpc_python_out=. proto/graph_loom.proto

   then use graph_loom_pb2 / graph_loom_pb2_grpc exactly like the
   reference example.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from graph_loom_spark.grpc_serve import GraphQueryClient  # noqa: E402


def run() -> None:
    # Default gRPC port is 50051; pass api_key=... if the server enables auth
    # (sent as 'x-api-key' metadata, like the reference).
    client = GraphQueryClient("localhost:50051")

    query = "CREATE (TEST:Note {name: 'github'});"
    params: dict[str, str] = {}  # optional $param substitutions

    response = client.execute(query, params=params, log=True)

    if response["error"]:
        print(f"Server Error: {response['error']}")
        return

    print(f"Affected Nodes: {response['affected_nodes']}")
    print(f"Affected Relationships: {response['affected_relationships']}")
    print(f"Mutated: {response['mutated']}")
    print("\nResults:")

    for row in response["rows"]:
        if "node" in row:
            n = row["node"]
            print(f"[Node] ID: {n['id']}, Label: {n['label']}, Meta: {n['metadata']}")
        elif "relationship" in row:
            r = row["relationship"]
            print(
                f"[Rel] ID: {r['id']}, {r['from_id']} -> {r['to_id']}, "
                f"Label: {r['label']}, Meta: {r['metadata']}"
            )
        elif "info" in row:
            print(f"[Info] {row['info']}")


if __name__ == "__main__":
    run()
