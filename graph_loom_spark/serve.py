"""HTTP serving layer (reference V1/V4: src/api/server.rs:60-278,
src/api/mod.rs:8-32).

``POST /api/query`` with JSON ``{"query": str, "params": {str: str}?,
"log": bool?}`` returns the outcome DTO
``{rows: [...], affected_nodes, affected_relationships, mutated}``
(rows shaped like server.rs:69-127: node/relationship/info tagged
records). Optional ``X-API-Key`` auth (server.rs:131-139); per-request
timeout (server.rs:160).

Concurrency model parity: the reference funnels every API query through
one mpsc channel onto a single engine thread (V4). Here a process-wide
lock serializes query execution against the session — Spark provides the
intra-query parallelism, the lock provides the reference's single-writer
mutation safety.

stdlib-only (ThreadingHTTPServer): no framework dependency; swap for any
WSGI server in production — the handler is ~100 lines of protocol.
"""

from __future__ import annotations

import json
import threading
from concurrent.futures import ThreadPoolExecutor
from concurrent.futures import TimeoutError as FutTimeout
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from graph_loom_spark.interface import CypherSession


class QueryServer:
    """Wraps a CypherSession behind the reference's HTTP contract."""

    def __init__(
        self,
        session: CypherSession,
        api_key: str | None = None,
        timeout_s: float = 30.0,
    ):
        self.session = session
        self.api_key = api_key
        self.timeout_s = timeout_s
        self._lock = threading.Lock()  # V4 single-writer broker
        self._pool = ThreadPoolExecutor(max_workers=1)

    # ------------------------------------------------------------- execute
    def handle_query(self, payload: dict) -> tuple[int, dict]:
        query = payload.get("query")
        if not isinstance(query, str) or not query.strip():
            return 400, {"error": "missing query"}
        params = payload.get("params") or {}
        if not isinstance(params, dict):
            return 400, {"error": "params must be an object"}
        params = {str(k): str(v) for k, v in params.items()}

        def run():
            with self._lock:
                return self.session.execute(query, params)

        fut = self._pool.submit(run)
        try:
            outcome = fut.result(timeout=self.timeout_s)
        except FutTimeout:
            return 504, {"error": f"query timed out after {self.timeout_s}s"}
        except Exception as e:  # execution errors are in-band (grpc.rs:88-94)
            return 200, {
                "rows": [],
                "affected_nodes": 0,
                "affected_relationships": 0,
                "mutated": False,
                "error": str(e),
            }
        return 200, outcome.to_dict()

    # --------------------------------------------------------------- serve
    def make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _reply(self, code: int, body: dict) -> None:
                data = json.dumps(body).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_POST(self):
                if self.path != "/api/query":
                    self._reply(404, {"error": "not found"})
                    return
                if server.api_key is not None:
                    if self.headers.get("X-API-Key") != server.api_key:
                        self._reply(401, {"error": "unauthorized"})
                        return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    payload = json.loads(self.rfile.read(n) or b"{}")
                except (ValueError, json.JSONDecodeError):
                    self._reply(400, {"error": "invalid JSON"})
                    return
                code, body = server.handle_query(payload)
                self._reply(code, body)

        return Handler

    def serve(self, host: str = "127.0.0.1", port: int = 8080) -> ThreadingHTTPServer:
        """Start serving in a daemon thread; returns the server (call
        ``.shutdown()`` to stop)."""
        httpd = ThreadingHTTPServer((host, port), self.make_handler())
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        return httpd
