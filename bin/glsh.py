#!/usr/bin/env python
"""glsh — Graph-Loom shell against the HTTP serving layer (reference V5,
src/bin/glsh.rs: readline client with history and --eval one-shot; this
client speaks the V1 HTTP contract instead of the WS REPL).

Usage:
    python bin/glsh.py [--host H] [--port P] [--api-key K] [-e QUERY] [-q]
"""

from __future__ import annotations

import argparse
import json
import sys
import urllib.error
import urllib.request


def run_query(base: str, api_key: str | None, query: str) -> dict:
    req = urllib.request.Request(
        f"{base}/api/query",
        data=json.dumps({"query": query}).encode(),
        headers={
            "Content-Type": "application/json",
            **({"X-API-Key": api_key} if api_key else {}),
        },
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


def render(outcome: dict) -> str:
    if outcome.get("error"):
        return f"error: {outcome['error']}"
    lines = []
    for row in outcome.get("rows", []):
        lines.append(json.dumps(row))
    lines.append(
        f"-- nodes={outcome.get('affected_nodes', 0)} "
        f"rels={outcome.get('affected_relationships', 0)} "
        f"mutated={outcome.get('mutated', False)}"
    )
    return "\n".join(lines)


def main() -> int:
    p = argparse.ArgumentParser(prog="glsh")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", default="8080")
    p.add_argument("--api-key", dest="api_key")
    p.add_argument("-e", "--eval", dest="eval_query")
    p.add_argument("-q", "--quiet", action="store_true")
    args = p.parse_args()
    base = f"http://{args.host}:{args.port}"

    if args.eval_query:
        try:
            print(render(run_query(base, args.api_key, args.eval_query)))
            return 0
        except urllib.error.URLError as e:
            print(f"connection failed: {e}", file=sys.stderr)
            return 1

    if not args.quiet:
        print(f"glsh connected to {base} — blank line or Ctrl-D to exit")
    try:
        import readline  # noqa: F401  (history/line editing)
    except ImportError:
        pass
    while True:
        try:
            line = input("glsh> ").strip()
        except (EOFError, KeyboardInterrupt):
            print()
            return 0
        if not line:
            return 0
        try:
            print(render(run_query(base, args.api_key, line)))
        except urllib.error.URLError as e:
            print(f"request failed: {e}", file=sys.stderr)


if __name__ == "__main__":
    sys.exit(main())
