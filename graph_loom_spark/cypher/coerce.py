"""String-typed comparison semantics (the P3 coercion rules).

Reference semantics (src/gql/cypher_spec.rs:1128-1134): every property
value is a string; a comparison parses both sides as f64 and compares
numerically when BOTH parse, else compares lexicographically. ORDER BY
uses the same numeric-first comparator per key (cypher_spec.rs:1486-1491).

These build plain Catalyst expressions (``try_cast`` + ``when``): no
UDFs, fully codegen-able, pushdown-friendly when the rhs is a literal.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_OPS = {"<", "<=", ">", ">=", "=", "<>"}


def _apply_op(lhs: Column, rhs: Column, op: str) -> Column:
    if op == "<":
        return lhs < rhs
    if op == "<=":
        return lhs <= rhs
    if op == ">":
        return lhs > rhs
    if op == ">=":
        return lhs >= rhs
    if op == "=":
        return lhs == rhs
    if op == "<>":
        return lhs != rhs
    raise ValueError(f"unsupported comparison operator: {op}")


def _literal_as_number(s: str) -> float | None:
    """Mirror Rust ``str::parse::<f64>`` closely enough: no underscores,
    no surrounding whitespace (Python's float() is more lenient)."""
    if s != s.strip() or "_" in s:
        return None
    try:
        return float(s)
    except ValueError:
        return None


def compare_expr(value: Column, literal: str, op: str) -> Column:
    """``value <op> literal`` with numeric-if-both-parse-else-lexicographic
    semantics. The literal side is known at compile time, so the numeric
    branch is emitted only when the literal parses as a number."""
    str_pred = _apply_op(value, F.lit(literal), op)
    num_lit = _literal_as_number(literal)
    if num_lit is None:
        return str_pred
    v_num = value.try_cast("double")
    return F.when(v_num.isNotNull(), _apply_op(v_num, F.lit(num_lit), op)).otherwise(str_pred)


def numeric_first_sort_cols(key: Column, asc: bool) -> list[Column]:
    """Sort columns reproducing the reference's numeric-first comparator
    for one ORDER BY key.

    Exact pairwise semantics (numeric iff both sides parse) is not a
    consistent total order; like the reference's sort over homogeneous
    columns, this sorts all numeric values numerically before all
    non-numeric values lexicographically (ASCII digits < letters keeps
    the common mixed cases identical), reversed wholesale for DESC.
    """
    num = key.try_cast("double")
    cols = [num.isNull(), num, key]
    return [c.asc() if asc else c.desc() for c in cols]
