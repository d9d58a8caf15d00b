"""Large-scale data-pipeline operators (beyond-reference surface):
relational analytics, windowed/sessionized event processing, text
analysis, deduplication, and similarity search — all built on
DataFrame/Catalyst primitives, designed for 100 TB-class inputs."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Widen a narrow input before a CPU-bound stage.

    Parquet splits by bytes, so a small-but-expensive input (short
    documents that each fan out into thousands of shingle hashes) can
    arrive as one partition and serialize the whole hashing stage onto a
    single core. Repartition up to the cluster's default parallelism —
    but only when the input is actually narrower, so a 100 TB table that
    already has thousands of splits is left untouched (no extra
    shuffle)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
