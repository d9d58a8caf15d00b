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
    conversion per distinct source per session instead of per query.
    Partitioning is a property of the PLAN, not the files, so the memo
    applies only to leaf scans (no children in the analyzed plan);
    transformed frames always probe directly."""
    target = df.sparkSession.sparkContext.defaultParallelism
    key = None
    try:
        if df._jdf.queryExecution().analyzed().children().isEmpty():
            files = tuple(sorted(df.inputFiles()))
            if files:
                key = (target, files)
    except Exception:
        key = None
    if key is not None:
        narrow = _SPREAD_CACHE.get(key)
        if narrow is None:
            narrow = df.rdd.getNumPartitions() < target
            _SPREAD_CACHE[key] = narrow
    else:  # transformed frame or non-file source: probe directly
        narrow = df.rdd.getNumPartitions() < target
    if narrow:
        return df.repartition(target)
    return df


_SPREAD_CACHE: dict[tuple, bool] = {}
