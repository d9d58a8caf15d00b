"""Reconstruct the FULL per-query timing map from a driver BENCH_r*.json
(whose "tail" field keeps only the last ~2000 chars of bench stdout).

The bench prints three tail-sized lines last (see bench.build_output_lines):
  {"variance": {...}}                        — A/B n/min/max spreads
  {"qta": {"o":"alpha","n":N,"v":[...]}}     — ALL timings, positional
  {"metric": ..., "queries": {...}, ...}     — compact summary (parsed)

The qta values align with the ALPHABETICALLY SORTED registry names from
__spark_entry__.queries(); "n" cross-checks the count. This script zips
them back together and prints one JSON object {name: seconds}.

Usage: python scripts/parse_bench_tail.py BENCH_r08.json
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def registry_names() -> list[str]:
    spec = importlib.util.spec_from_file_location(
        "entrymod", os.path.join(REPO, "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return sorted(m.queries().keys())


def reconstruct(tail: str, names: list[str]) -> dict[str, float]:
    qta = None
    for line in tail.splitlines():
        line = line.strip()
        if line.startswith('{"qta"'):
            try:
                qta = json.loads(line)["qta"]
            except json.JSONDecodeError:
                continue  # clipped head fragment
    if qta is None:
        raise SystemExit("no complete qta line in the tail")
    if qta["n"] != len(names):
        raise SystemExit(
            f"qta carries {qta['n']} values but the registry has "
            f"{len(names)} — registry changed since this bench ran"
        )
    # the name-list fingerprint catches count-preserving registry
    # changes (rename, add+remove) that the count check cannot
    if "k8" in qta:
        import hashlib

        fp = hashlib.md5(",".join(names).encode()).hexdigest()[:8]
        if fp != qta["k8"]:
            raise SystemExit(
                f"qta name fingerprint {qta['k8']} != registry {fp} — the "
                "registry names changed since this bench ran; check out the "
                "commit the bench ran against"
            )
    return dict(zip(names, qta["v"]))


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r08.json"
    rec = json.load(open(path))
    tail = rec.get("tail") or ""
    timings = reconstruct(tail, registry_names())
    print(json.dumps(timings, indent=1, sort_keys=True))
    bad = {k: v for k, v in timings.items() if v < 0}
    if bad:
        print(f"failed queries: {sorted(bad)}", file=sys.stderr)


if __name__ == "__main__":
    main()
