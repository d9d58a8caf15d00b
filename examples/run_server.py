"""Headless server runner — reference `main.rs --background` parity
(src/main.rs:230-290): start the HTTP API (and the gRPC service when
grpcio is installed), then keep a 5 s dirty-autosave loop running so
mutations survive a crash. Ctrl-C to stop.

    python examples/run_server.py [--port 8080] [--snapshot DIR] [--api-key KEY]

``--snapshot DIR`` both loads the graph from DIR (if it has a saved
snapshot) and receives the versioned autosaves.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from graph_loom_spark.graph import PropertyGraph  # noqa: E402
from graph_loom_spark.interface import CypherSession  # noqa: E402
from graph_loom_spark.serve import QueryServer  # noqa: E402
from graph_loom_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--grpc-port", type=int, default=50051)
    ap.add_argument("--snapshot", default="assets/state")
    ap.add_argument("--api-key", default=None)
    ap.add_argument("--autosave-interval", type=float, default=5.0)
    args = ap.parse_args()

    spark = get_spark(app_name="graph-loom-server")
    if os.path.isdir(os.path.join(args.snapshot, "nodes")):
        graph = PropertyGraph.load(spark, args.snapshot)
        print(f"[graph-loom] loaded snapshot from {args.snapshot}")
    else:
        graph = PropertyGraph.empty(spark)
    qs = QueryServer(CypherSession(graph), api_key=args.api_key)
    httpd = qs.serve(port=args.port)
    print(f"[graph-loom] HTTP API on :{httpd.server_address[1]} "
          "(POST /api/query, WS /api/repl)")
    try:
        from graph_loom_spark.grpc_serve import serve_grpc

        grpc_server = serve_grpc(qs, port=args.grpc_port)
        print(f"[graph-loom] gRPC on :{args.grpc_port}")
    except Exception as e:  # grpcio absent — HTTP/WS still serve
        grpc_server = None
        print(f"[graph-loom] gRPC disabled ({e})")
    qs.start_autosave(args.snapshot, interval_s=args.autosave_interval)
    print(f"[graph-loom] autosaving to {args.snapshot} every "
          f"{args.autosave_interval}s when dirty")
    try:
        while True:
            time.sleep(1.0)
    except KeyboardInterrupt:
        pass
    finally:
        qs.stop_autosave()
        httpd.shutdown()
        if grpc_server is not None:
            grpc_server.stop(1.0)
        spark.stop()


if __name__ == "__main__":
    main()
