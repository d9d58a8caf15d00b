

def test_merge_upsert_semantics_and_validation(spark):
    import pytest

    from graph_loom_spark.ops.relational import merge_upsert

    cur = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id int, val string"
    )
    ch = spark.createDataFrame(
        [(2, "B", "upsert"), (3, None, "delete"), (9, "i", "upsert")],
        "id int, val string, op string",
    )
    got = {(r["id"], r["val"]) for r in merge_upsert(cur, ch, ["id"]).collect()}
    assert got == {(1, "a"), (2, "B"), (9, "i")}

    with pytest.raises(ValueError, match="unknown op"):
        merge_upsert(
            cur,
            spark.createDataFrame([(1, "x", "replace")], "id int, val string, op string"),
            ["id"],
        )
    with pytest.raises(ValueError, match="duplicate change key"):
        merge_upsert(
            cur,
            spark.createDataFrame(
                [(1, "x", "upsert"), (1, "y", "upsert")], "id int, val string, op string"
            ),
            ["id"],
        )


def test_hll_distinct_accuracy_and_dup_invariance(spark):
    from graph_loom_spark.ops import relational as ops_rel

    df = spark.range(3000).selectExpr("'g' AS grp", "CAST(id AS STRING) AS v")
    out = ops_rel.hll_distinct(df, ["grp"], "v", p=10).collect()[0]
    # HLL with m=1024 registers: ~1.04/sqrt(1024) = 3.25% std error
    assert abs(out["est_distinct"] - 3000) / 3000 < 0.15
    # the sketch is a function of the SET: duplicating every row
    # changes nothing (register max is idempotent)
    df2 = df.unionAll(df)
    out2 = ops_rel.hll_distinct(df2, ["grp"], "v", p=10).collect()[0]
    assert out2["est_distinct"] == out["est_distinct"]
    assert out2["zero_registers"] == out["zero_registers"]


def test_hll_distinct_small_range_correction(spark):
    from graph_loom_spark.ops import relational as ops_rel

    # 5 distinct values -> linear-counting branch (E <= 2.5m, V > 0)
    df = spark.createDataFrame(
        [("g", str(i % 5)) for i in range(50)], "grp string, v string"
    )
    out = ops_rel.hll_distinct(df, ["grp"], "v", p=10).collect()[0]
    assert 3 <= out["est_distinct"] <= 7
    assert out["zero_registers"] >= 1019


def test_hash_sampled_percentiles_close_to_exact(spark):
    from graph_loom_spark.ops import relational as ops_rel

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    exact = {r["l_returnflag"]: r["p50"] for r in ops_rel.price_percentiles(li).collect()}
    sampled = {
        r["l_returnflag"]: (r["n_sample"], r["p50"])
        for r in ops_rel.hash_sampled_percentiles(
            li, ["l_returnflag"], "l_extendedprice", ["l_orderkey", "l_linenumber"]
        ).collect()
    }
    n_total = li.count()
    for flag, (n, p50) in sampled.items():
        # ~1/16 sample rate
        assert n < n_total / 8
        # median of a >1k uniform sample lands within ~10% of exact
        assert abs(p50 - exact[flag]) / exact[flag] < 0.10


def test_count_min_estimate_one_sided_and_exact_when_wide(spark):
    from pyspark.sql import functions as F

    from graph_loom_spark.ops.relational import count_min_estimate

    rows = [("a",)] * 7 + [("b",)] * 3 + [("c",)] * 1 + [("d",)] * 5
    df = spark.createDataFrame(rows, "v string")
    actual = {"a": 7, "b": 3, "c": 1, "d": 5}

    # wide grid: 4 values cannot collide across all 4 rows -> exact
    wide = {r["value"]: r["est"] for r in count_min_estimate(df, "v", w=1024).collect()}
    assert wide == actual

    # tiny grid (w=2) forces collisions: est >= actual for every value,
    # and total mass per hash row is conserved (sum of cells == n rows)
    tight = {r["value"]: r["est"] for r in count_min_estimate(df, "v", w=2).collect()}
    assert set(tight) == set(actual)
    assert all(tight[v] >= actual[v] for v in actual)

    # explicit probe frame restricts the output
    probe = spark.createDataFrame([("a",), ("zz",)], "v string")
    probed = {
        r["value"]: r["est"]
        for r in count_min_estimate(df, "v", probe=probe, w=1024).collect()
    }
    # 'zz' was never inserted: estimate is whatever its cells hold (>= 0
    # one-sided), 'a' is exact at this width
    assert probed["a"] == 7 and probed["zz"] >= 0
    assert set(probed) == {"a", "zz"}


def test_hll_and_cms_merge_equal_single_pass(spark):
    from pyspark.sql import functions as F

    from graph_loom_spark.ops.relational import (
        cms_merge,
        count_min_estimate,
        hll_distinct,
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lo, hi = docs.filter("doc_id < 250"), docs.filter("doc_id >= 250")

    # HLL: merge-then-estimate == single-pass estimate, EXACTLY
    merged = hll_merge(
        hll_registers(lo, ["source"], "text", p=8),
        hll_registers(hi, ["source"], "text", p=8),
        ["source"],
    )
    got = {
        r["source"]: (r["est_distinct"], r["zero_registers"])
        for r in hll_estimate(merged, ["source"], p=8).collect()
    }
    want = {
        r["source"]: (r["est_distinct"], r["zero_registers"])
        for r in hll_distinct(docs, ["source"], "text", p=8).collect()
    }
    assert got == want and len(want) == 20

    # CMS: merged grids probe identically to the single-pass grid
    tok = docs.select(F.explode(F.split("text", " ")).alias("v"))
    tlo = lo.select(F.explode(F.split("text", " ")).alias("v"))
    thi = hi.select(F.explode(F.split("text", " ")).alias("v"))

    # the two half-grids merged must equal the full-pass grid cell-wise
    cells_full = {
        (r["j"], r["b"]): r["cnt"] for r in _cms_cells(spark, tok, 64).collect()
    }
    merged_cells = {
        (r["j"], r["b"]): r["cnt"]
        for r in cms_merge(_cms_cells(spark, tlo, 64), _cms_cells(spark, thi, 64)).collect()
    }
    assert merged_cells == cells_full


def _cms_cells(spark, tok, w):
    # the batch twin of the streaming grid builder (same construction)
    from pyspark.sql import functions as F

    cells = tok.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        (
                            F.conv(
                                F.substring(F.md5(F.concat(F.lit(f"{j}:"), F.col("v"))), 1, 8),
                                16,
                                10,
                            ).cast("long")
                            % w
                        ).alias("b"),
                    )
                    for j in range(4)
                ]
            )
        ).alias("c")
    ).select("c.j", "c.b")
    return cells.groupBy("j", "b").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))


def test_profile_table_exact_stats(spark):
    import pytest
    from pyspark.sql import functions as F

    from graph_loom_spark.ops import relational as ops_rel

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None), (3, None, 10), (4, "a", 9)],
        "id bigint, s string, v int",
    )
    rows = {r["col_name"]: r for r in ops_rel.profile_table(df).collect()}
    assert set(rows) == {"id", "s", "v"}
    assert all(r["n_rows"] == 4 for r in rows.values())
    assert (rows["s"]["n_nulls"], rows["s"]["n_distinct"]) == (1, 2)
    assert (rows["v"]["n_nulls"], rows["v"]["n_distinct"]) == (1, 2)
    # min/max computed in NATIVE type then rendered: v max is 10, not "9"
    assert (rows["v"]["min_str"], rows["v"]["max_str"]) == ("9", "10")
    assert (rows["id"]["min_str"], rows["id"]["max_str"]) == ("1", "4")
    # column subset + empty-columns guard
    sub = ops_rel.profile_table(df, columns=["id"]).collect()
    assert len(sub) == 1 and sub[0]["col_name"] == "id"
    with pytest.raises(ValueError):
        ops_rel.profile_table(df.select())


def test_corpus_diff_statuses_and_null_safety(spark):
    import pytest

    from graph_loom_spark.ops import relational as ops_rel

    old = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", None), (3, "c", "z"), (4, "d", "w")],
        "id bigint, t string, m string",
    )
    new = spark.createDataFrame(
        [
            (1, "a", "x"),      # unchanged -> omitted
            (2, "b", "now"),    # NULL -> value = changed
            (3, None, "z"),     # value -> NULL = changed
            (5, "e", "v"),      # added
        ],                      # 4 missing = removed
        "id bigint, t string, m string",
    )
    got = {
        (r["id"], r["status"])
        for r in ops_rel.corpus_diff(old, new, ["id"], ["t", "m"]).collect()
    }
    assert got == {(2, "changed"), (3, "changed"), (4, "removed"), (5, "added")}
    with pytest.raises(ValueError):
        ops_rel.corpus_diff(old, new, [], ["t"])
