"""Bucketed-table writer: the co-located-join layout for repeated
equi-joins at 100 TB.

Spark's bucketing (`bucketBy` + `saveAsTable`) hash-partitions rows into
a fixed number of files per partition ON WRITE; two tables bucketed by
the same column into the same bucket count then join with NO exchange on
either side — the shuffle is paid once at write time instead of on every
join. This is the layout the fact↔fact joins in this engine's README
("orders↔lineitem is the real shuffle join … the layout a 100 TB run
wants bucketed") assume; the plan property (no Exchange under the join)
is pinned by tests/test_plans.py.

Bucket metadata lives in the session catalog (works with the default
in-memory catalog — no Hive metastore needed); pass ``path`` to keep the
data external so it outlives the catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    path: str | None = None,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally
    per-bucket sorted) on ``bucket_col``.

    ``n_buckets`` must match across tables meant to co-join. Sorting
    within buckets additionally lets sort-merge joins skip their sort.
    """
    w = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col is not None:
        w = w.sortBy(sort_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket column —
    plans as an exchange-free sort-merge join (bucket counts must match;
    Spark falls back to a normal shuffle join when they don't)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
