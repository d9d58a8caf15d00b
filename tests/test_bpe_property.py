"""Property tests for the BPE oracle's core equivalence claim: applying
a merge to a doubled-separator string via left-to-right non-overlapping
``replace()`` (what the DuckDB oracle does) is EXACTLY the greedy scan
``_py_apply_merge`` performs on the symbol list (what the engine's
Arrow rewrite does). The r9 train/encode oracles stand on this."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from graph_loom_spark.ops.bpe import _py_apply_merge

SEP = "\x1f"


def _wrap(sym: list[str]) -> str:
    return SEP + (SEP + SEP).join(sym) + SEP


def _unwrap(s: str) -> list[str]:
    return s[1:-1].split(SEP + SEP)


def _replace_merge(s: str, l: str, r: str) -> str:
    # Python str.replace is left-to-right non-overlapping — the same
    # contract as DuckDB replace()
    return s.replace(SEP + l + SEP + SEP + r + SEP, SEP + l + r + SEP)


sym_alpha = st.text(alphabet="ab</w>", min_size=1, max_size=4)


@settings(max_examples=300, deadline=None)
@given(
    sym=st.lists(sym_alpha, min_size=1, max_size=12),
    l=sym_alpha,
    r=sym_alpha,
)
def test_replace_rewrite_equals_greedy_scan(sym, l, r):
    via_list = _py_apply_merge(sym, l, r, l + r)
    via_str = _unwrap(_replace_merge(_wrap(sym), l, r))
    assert via_str == via_list


@settings(max_examples=100, deadline=None)
@given(
    sym=st.lists(sym_alpha, min_size=1, max_size=10),
    merges=st.lists(st.tuples(sym_alpha, sym_alpha), min_size=1, max_size=6),
)
def test_chained_replaces_equal_chained_scans(sym, merges):
    """Rank-order application (the X124 encode path): a CHAIN of
    replaces must equal the chain of greedy scans, including merges
    whose parts are earlier merge outputs."""
    via_list = list(sym)
    s = _wrap(sym)
    for l, r in merges:
        via_list = _py_apply_merge(via_list, l, r, l + r)
        s = _replace_merge(s, l, r)
    assert _unwrap(s) == via_list


def test_overlap_classes_pin_the_doubled_separator_choice():
    """The concrete failure the doubling prevents: single separators
    share boundary chars between adjacent matches."""
    assert _unwrap(_replace_merge(_wrap(["a", "b", "a", "b"]), "a", "b")) == [
        "ab",
        "ab",
    ]
    assert _unwrap(_replace_merge(_wrap(["a", "a", "a"]), "a", "a")) == [
        "aa",
        "a",
    ]
