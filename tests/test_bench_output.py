"""The driver keeps only the LAST 2000 chars of bench stdout, so the
final three lines (variance, positional qta, compact summary) must fit
the window TOGETHER and must reconstruct every per-query timing
(VERDICT r7 ask #2: r7 lost 71 of 132 timings to the tail cap)."""

from __future__ import annotations

import json
import random
import sys

sys.path.insert(0, "/root/repo")

import bench


def _fixture(n_queries: int = 140, n_ab: int = 12):
    rng = random.Random(7)
    names = [f"docs_operator_name_{i:03d}" for i in range(n_queries - 32)] + [
        f"graph_iterative_algo_{i:02d}" for i in range(32)
    ]
    timings = {n: round(rng.uniform(0.05, 45.0), 3) for n in names}
    timings[names[3]] = -1.0  # a failed query must round-trip too
    variance = {
        n: {
            "n": 3,
            "min": round(rng.uniform(1, 20), 3),
            "max": round(rng.uniform(20, 70), 3),
        }
        for n in names[:n_ab]
    }
    return timings, variance


def test_tail_lines_fit_window_together():
    timings, variance = _fixture()
    _, _, vline, qta, compact = bench.build_output_lines(
        timings, variance, 0.1, "f" * 32
    )
    # +3 newlines: the window must carry all three lines WHOLE
    assert len(vline) + len(qta) + len(compact) + 3 <= bench.TAIL_WINDOW


def test_qta_reconstructs_every_timing():
    timings, variance = _fixture()
    _, _, _, qta, _ = bench.build_output_lines(timings, variance, 0.1, None)
    payload = json.loads(qta)["qta"]
    assert payload["o"] == "alpha"
    assert payload["n"] == len(timings)
    reconstructed = dict(zip(sorted(timings), payload["v"]))
    for name, sec in timings.items():
        assert reconstructed[name] == round(sec, 2)


def test_compact_line_parses_and_carries_pq_digest():
    timings, variance = _fixture()
    _, _, _, _, compact = bench.build_output_lines(
        timings, variance, 0.1, "3ce9cf8f57671e817f98c0038f176b99"
    )
    parsed = json.loads(compact)
    assert parsed["metric"] == "total_bench_seconds"
    assert parsed["pq_md5"] == "3ce9cf8f57671e817f98c0038f176b99"
    # slowest-first: every named entry must be >= the max omitted timing
    named = set(parsed["queries"])
    if parsed["queries_omitted"]:
        floor = min(parsed["queries"].values())
        omitted_max = max(
            round(t, 2) for n, t in timings.items() if n not in named
        )
        assert floor >= omitted_max


def test_oversized_variance_still_leaves_parseable_final_lines():
    # pathological watch list: even if variance alone outgrows the
    # window, qta + compact (the last two lines) must fit by themselves
    timings, _ = _fixture()
    variance = {
        n: {"n": 3, "min": 1.0, "max": 2.0} for n in list(timings)[:60]
    }
    _, _, _, qta, compact = bench.build_output_lines(timings, variance, 0.1, None)
    assert len(qta) + len(compact) + 2 <= bench.TAIL_WINDOW
