"""Large-scale data-pipeline operators (beyond-reference surface):
relational analytics, windowed/sessionized event processing, text
analysis, deduplication, and similarity search — all built on
DataFrame/Catalyst primitives, designed for 100 TB-class inputs."""

from __future__ import annotations

import math
import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame

# Logical nodes that preserve the file scan's partitioning (all unary,
# no exchange). Anything else (Join/Aggregate/Repartition/Deduplicate/…)
# means the frame's width is shuffle-determined, not scan-determined.
_NARROW_NODES = {"Filter", "Project", "SubqueryAlias", "View"}
_SCAN_NODES = {"LogicalRelation", "Relation", "DataSourceV2Relation"}


def _estimated_scan_partitions(df: DataFrame) -> int | None:
    """Estimate the file-source partition count from driver metadata only.

    Mirrors Spark's ``FilePartition`` sizing: ``maxSplitBytes =
    min(maxPartitionBytes, max(openCostInBytes, totalBytes/parallelism))``
    then splits packed to that size. Returns None when the frame is not a
    narrow transform of a file scan (its width is shuffle-determined) or
    when the files can't be stat'ed (remote FS) — callers then leave the
    frame untouched. Never converts the plan to an RDD."""
    plan = df._jdf.queryExecution().analyzed()
    while True:
        name = plan.nodeName()
        if name in _SCAN_NODES:
            break
        if name not in _NARROW_NODES or plan.children().size() != 1:
            return None
        plan = plan.children().apply(0)
    sizes = []
    for uri in df.inputFiles():
        parsed = urlparse(uri)
        if parsed.scheme not in ("", "file"):
            return None  # can't stat remote files cheaply; don't guess
        sizes.append(os.path.getsize(unquote(parsed.path)))
    if not sizes:
        return None
    conf = df.sparkSession.conf
    max_pb = _parse_bytes(conf.get("spark.sql.files.maxPartitionBytes", "134217728b"))
    open_cost = _parse_bytes(conf.get("spark.sql.files.openCostInBytes", "4194304b"))
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    total = sum(s + open_cost for s in sizes)
    max_split = min(max_pb, max(open_cost, total // max(1, parallelism)))
    return max(1, math.ceil(total / max(1, max_split)))


def _parse_bytes(v) -> int:
    s = str(v).strip().lower()
    units = {"b": 1, "k": 1 << 10, "kb": 1 << 10, "m": 1 << 20, "mb": 1 << 20, "g": 1 << 30, "gb": 1 << 30}
    for suffix, mult in sorted(units.items(), key=lambda kv: -len(kv[0])):
        if s.endswith(suffix):
            return int(s[: -len(suffix)]) * mult
    return int(s)


def spread(df: DataFrame) -> DataFrame:
    """Widen a narrow input before a CPU-bound stage.

    Parquet splits by bytes, so a small-but-expensive input (short
    documents that each fan out into thousands of shingle hashes) can
    arrive as one partition and serialize the whole hashing stage onto a
    single core. Repartition up to the cluster's default parallelism —
    but only when the input is actually narrower, so a 100 TB table that
    already has thousands of splits is left untouched (no extra
    shuffle).

    Narrowness comes from driver-side metadata alone (file sizes vs
    Spark's split-packing formula) — no plan→RDD conversion, no cache to
    go stale. Frames that are not narrow transforms of a file scan have
    already shuffled to ``spark.sql.shuffle.partitions`` width and are
    returned untouched."""
    try:
        est = _estimated_scan_partitions(df)
    except Exception:
        est = None
    if est is None:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if est < target:
        return df.repartition(target)
    return df
