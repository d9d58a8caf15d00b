"""String-typed comparison semantics (the P3 coercion rules).

Reference semantics (src/gql/cypher_spec.rs:1128-1134): every property
value is a string; a comparison parses both sides as f64 and compares
numerically when BOTH parse, else compares lexicographically. ORDER BY
uses the same numeric-first comparator per key (cypher_spec.rs:1486-1491).

These build plain Catalyst expressions (``try_cast`` + ``when``): no
UDFs, fully codegen-able, pushdown-friendly when the rhs is a literal.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column
from pyspark.sql import functions as F

_OPS = {"<", "<=", ">", ">=", "=", "<>"}

# Rust ``str::parse::<f64>`` grammar (what the reference accepts as a
# number): optional sign, then inf/infinity/nan (case-insensitive) or a
# decimal with optional exponent. NO leading/trailing whitespace, NO
# underscores, NO hex floats, NO Java 'f'/'d' suffixes — all of which
# Spark's try_cast(double) would otherwise accept (probed: ' 1', '1f',
# '1d', '0x1p3' all parse in Spark, all reject in Rust). The numeric
# branch is therefore gated on this regex; inside the accepted subset,
# Spark's parse agrees with Rust's.
_RUST_F64_RE = r"(?i)^[+-]?(inf(inity)?|nan|(([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?))$"
_RUST_F64_PY = _re.compile(_RUST_F64_RE)


def _value_as_number(value: Column) -> Column:
    """Value-side numeric parse with reference (Rust f64) acceptance.
    Signed NaN forms are mapped explicitly: Rust parses '-nan'/'+nan'
    but Spark's cast rejects them."""
    return F.when(value.rlike(r"(?i)^[+-]?nan$"), F.lit(float("nan"))).when(
        value.rlike(_RUST_F64_RE), value.try_cast("double")
    )


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
    """Mirror Rust ``str::parse::<f64>`` exactly: accept only the
    _RUST_F64_RE grammar (Python's float() is more lenient — it takes
    surrounding whitespace and '1_0')."""
    if not _RUST_F64_PY.match(s):
        return None
    try:
        return float(s)
    except ValueError:  # pragma: no cover — grammar implies parseable
        return None


def compare_expr(value: Column, literal: str, op: str) -> Column:
    """``value <op> literal`` with numeric-if-both-parse-else-lexicographic
    semantics. The literal side is known at compile time, so the numeric
    branch is emitted only when the literal parses as a number."""
    import math

    str_pred = _apply_op(value, F.lit(literal), op)
    num_lit = _literal_as_number(literal)
    if num_lit is None:
        return str_pred
    v_num = _value_as_number(value)
    # IEEE NaN semantics like the reference's raw f64 ops (every
    # comparison false except <>) — Spark SQL would otherwise treat NaN
    # as equal-to-itself and greater-than-everything.
    if math.isnan(num_lit):
        num_branch = F.lit(op == "<>")
    else:
        num_branch = F.when(F.isnan(v_num), F.lit(op == "<>")).otherwise(
            _apply_op(v_num, F.lit(num_lit), op)
        )
    return F.when(v_num.isNotNull(), num_branch).otherwise(str_pred)


def numeric_first_sort_cols(key: Column, asc: bool) -> list[Column]:
    """Sort columns reproducing the reference's numeric-first comparator
    for one ORDER BY key.

    Exact pairwise semantics (numeric iff both sides parse) is not a
    consistent total order; like the reference's sort over homogeneous
    columns, this sorts all numeric values numerically before all
    non-numeric values lexicographically (ASCII digits < letters keeps
    the common mixed cases identical), reversed wholesale for DESC.
    """
    num = _value_as_number(key)
    cols = [num.isNull(), num, key]
    return [c.asc() if asc else c.desc() for c in cols]
