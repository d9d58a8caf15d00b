

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
