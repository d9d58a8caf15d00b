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
    shuffle).

    The narrowness probe (``df.rdd.getNumPartitions()``) forces a plan→
    RDD conversion, so its result is memoized per input-file set — one
    conversion per distinct source per session instead of per query."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        key = (target, tuple(sorted(df.inputFiles())))
    except Exception:
        key = None
    if key is not None and key[1]:
        narrow = _SPREAD_CACHE.get(key)
        if narrow is None:
            narrow = df.rdd.getNumPartitions() < target
            _SPREAD_CACHE[key] = narrow
    else:  # non-file source (e.g. createDataFrame): probe directly
        narrow = df.rdd.getNumPartitions() < target
    if narrow:
        return df.repartition(target)
    return df


_SPREAD_CACHE: dict[tuple, bool] = {}
