#!/usr/bin/env python
"""glsh — Graph-Loom shell over the WebSocket REPL (reference V5,
src/bin/glsh.rs: a WS client with readline history and --eval one-shot,
speaking the V2 line-per-query REPL at ws://host:port/api/repl).

The server replies with pretty-printed outcome JSON, ``error: ...`` for
execution failures, or ``timeout`` — printed verbatim, like the
reference shell.

Usage:
    python bin/glsh.py [--host H] [--port P] [--api-key K] [-e QUERY] [-q]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from graph_loom_spark.ws import WebSocketClient  # noqa: E402


def connect(host: str, port: int, api_key: str | None) -> WebSocketClient:
    try:
        client = WebSocketClient(host, port, "/api/repl", api_key=api_key)
    except (OSError, ConnectionError) as e:
        print(
            f"Failed to connect: {e}\n"
            "Hint: Ensure the Graph-Loom server is running "
            f"(ws://{host}:{port}/api/repl).",
            file=sys.stderr,
        )
        sys.exit(2)
    # consume the connect banner (glsh.rs does the same) so the first
    # query's response isn't mistaken for it
    try:
        client.recv_text()
    except ConnectionError:
        pass
    return client


def main() -> int:
    p = argparse.ArgumentParser(prog="glsh")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--api-key", dest="api_key")
    p.add_argument("-e", "--eval", dest="eval_query")
    p.add_argument("-q", "--quiet", action="store_true")
    args = p.parse_args()

    client = connect(args.host, args.port, args.api_key)

    if args.eval_query:
        if not args.eval_query.strip():
            print("empty query", file=sys.stderr)
            client.close()
            return 1
        try:
            client.send_text(args.eval_query)
            print(client.recv_text())
        except (ConnectionError, OSError) as e:
            print(f"request failed: {e}", file=sys.stderr)
            return 1
        finally:
            client.close()
        return 0

    if not args.quiet:
        print(f"glsh connected to ws://{args.host}:{args.port}/api/repl — blank line or Ctrl-D to exit")
    try:
        import readline  # noqa: F401  (history/line editing)
    except ImportError:
        pass
    while True:
        try:
            line = input("glsh> ").strip()
        except (EOFError, KeyboardInterrupt):
            print()
            break
        if not line:
            break
        try:
            client.send_text(line)
            print(client.recv_text())
        except (ConnectionError, OSError) as e:
            print(f"request failed: {e}", file=sys.stderr)
            return 1
    client.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
