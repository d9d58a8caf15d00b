"""Fuzz the P3 coercion comparator against a pure-Python model of the
reference semantics (cypher_spec.rs:1122-1139: numeric compare iff BOTH
sides parse as Rust f64, IEEE NaN behavior, else byte-wise string
compare). One Spark pass evaluates every (value, literal, op) cell; the
model is rebuilt independently in Python, so branch logic, the Rust-
grammar gate, and NaN handling are all cross-checked on hundreds of
adversarial strings — including the Java-parser-isms Spark's try_cast
would accept but the reference rejects (' 1', '1f', '1d', '0x1p3')."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from graph_loom_spark.cypher.coerce import _RUST_F64_PY, compare_expr

OPS = ["<", "<=", ">", ">=", "=", "<>"]

EDGE_VALUES = [
    "1", " 1", "1 ", "1f", "1d", "0x1p3", "inf", "Infinity", "-inf", "NaN",
    "nan", "1_0", "1e3", "+5", "3.", ".5", "", " ", "1,0", "01", "-0", "0",
    "-0.0", "1e999", "-1e999", "abc", "Z", "10", "9", "100", "99",
    "1956", "BUILDING", "2e-3", "0.002", ".2e1", "2.", "+inf", "-nan",
]

LITERALS = ["1", "0", "-0", "10", "9.5", "1e3", "nan", "inf", "-inf",
            "abc", "Z", "", "1f", " 1", "1956", "0.002"]


def _rust_parse(s: str) -> float | None:
    if not _RUST_F64_PY.match(s):
        return None
    return float(s)


def _model(value: str, literal: str, op: str) -> bool:
    a, b = _rust_parse(value), _rust_parse(literal)
    if a is not None and b is not None:
        if math.isnan(a) or math.isnan(b):
            return op == "<>"
        return {
            "<": a < b, "<=": a <= b, ">": a > b,
            ">=": a >= b, "=": a == b, "<>": a != b,
        }[op]
    return {
        "<": value < literal, "<=": value <= literal, ">": value > literal,
        ">=": value >= literal, "=": value == literal, "<>": value != literal,
    }[op]


def test_compare_expr_matches_reference_model(spark):
    rng = random.Random(0)
    alphabet = "0123456789.eE+-infaNbcZ _,x"
    values = list(EDGE_VALUES)
    for _ in range(150):
        values.append("".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8))))

    df = spark.createDataFrame([(v,) for v in values], "v string")
    cols, keys = [], []
    for li, lit in enumerate(LITERALS):
        for op in OPS:
            name = f"c_{li}_{OPS.index(op)}"
            keys.append((name, lit, op))
            cols.append(compare_expr(F.col("v"), lit, op).alias(name))
    rows = df.select("v", *cols).collect()

    mismatches = []
    for r in rows:
        for name, lit, op in keys:
            expect = _model(r["v"], lit, op)
            if bool(r[name]) != expect:
                mismatches.append((repr(r["v"]), repr(lit), op, r[name], expect))
    assert not mismatches, f"{len(mismatches)} divergences, first 10: {mismatches[:10]}"
