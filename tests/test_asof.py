"""As-of join semantics: latest right row at-or-before each left row,
per key, left-join nulls when nothing precedes."""

from __future__ import annotations

from graph_loom_spark.ops.events import asof_join


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, "l1"), (1, 20, "l2"), (2, 5, "l3"), (3, 7, "l4")],
        "k int, ts int, lval string",
    )
    right = spark.createDataFrame(
        [(1, 10, "r@10"), (1, 15, "r@15"), (1, 25, "r@25"), (2, 6, "r@6")],
        "k int, ts int, rval string",
    )
    out = {
        r["lval"]: (r["__asof_ts"], r["rval"])
        for r in asof_join(left, right, on=["k"], ts_col="ts").collect()
    }
    assert out["l1"] == (10, "r@10")  # exact-timestamp right row matches
    assert out["l2"] == (15, "r@15")  # latest at-or-before, not the later r@25
    assert out["l3"] == (None, None)  # right row is later → left-join nulls
    assert out["l4"] == (None, None)  # key with no right rows at all
    assert len(out) == 4
