"""Event-stream operators over the `events` table (batch forms; the
streaming module exposes the readStream equivalents).

Time bucketing uses ``F.window`` (tumbling) whose bucket start equals
``date_trunc('hour', ts)`` for aligned widths — that equivalence is what
the DuckDB oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def load_events(spark: SparkSession, path: str) -> DataFrame:
    """Read the events table, tolerating TIMESTAMP(NANOS) parquet (which
    vanilla Spark rejects): nanos are read as long via the legacy conf and
    truncated to a proper micros timestamp with integer division (never
    float — epoch nanos exceed double's 2^53 integer range)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def hourly_agg(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour window per event_type: count + exact value sum."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Gap-based sessionization: lag + cumulative-sum session ids, then
    per-user session count. The classic batch pattern; streaming uses
    ``session_window`` instead."""
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return (
        events.withColumn("__new", is_new)
        .groupBy("user_id")
        .agg(F.sum("__new").cast("bigint").alias("n_sessions"))
    )


def top_users_by_value(events: DataFrame, event_type: str = "purchase", k: int = 20) -> DataFrame:
    """Filtered top-k aggregation (orderBy+limit → TakeOrdered at scale)."""
    return (
        events.filter(F.col("event_type") == event_type)
        .groupBy("user_id")
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"))
        .orderBy(F.col("total_value").desc(), F.col("user_id"))
        .limit(k)
    )
