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
# Driver-local leaves: the data lives in the driver (createDataFrame /
# LocalRelation / literal ranges) and arrives in however few partitions
# the session default carves it into — treat as maximally narrow.
_LOCAL_NODES = {"LocalRelation", "OneRowRelation", "Range"}


def _estimated_scan_partitions(df: DataFrame) -> int | None:
    """Estimate the file-source partition count from driver metadata only.

    Mirrors Spark's ``FilePartition`` sizing: ``maxSplitBytes =
    min(maxPartitionBytes, max(openCostInBytes, totalBytes/parallelism))``
    then splits packed to that size (approximation: per-file split
    boundaries, bin-packing, and non-splittable codecs are ignored, so
    the estimate can be off by ±1 partition near the threshold — an
    acceptable error for a widen-or-not decision). Returns 1 for
    driver-local leaves (LocalRelation etc. — always narrow). Returns
    None when the frame is not a narrow transform of a file scan (its
    width is shuffle-determined) or when the files can't be stat'ed
    (remote FS) — callers then leave the frame untouched. Never converts
    the plan to an RDD."""
    plan = df._jdf.queryExecution().analyzed()
    while True:
        name = plan.nodeName()
        if name in _SCAN_NODES:
            break
        if name in _LOCAL_NODES:
            return 1
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
    try:
        max_pb = _parse_bytes(conf.get("spark.sql.files.maxPartitionBytes", "134217728b"))
    except ValueError:
        max_pb = 128 << 20  # Spark default; a bad conf string must not disable spread
    try:
        open_cost = _parse_bytes(conf.get("spark.sql.files.openCostInBytes", "4194304b"))
    except ValueError:
        open_cost = 4 << 20
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    total = sum(s + open_cost for s in sizes)
    max_split = min(max_pb, max(open_cost, total // max(1, parallelism)))
    return max(1, math.ceil(total / max(1, max_split)))


def _parse_bytes(v) -> int:
    """Spark byte-string syntax: optional fractional number + optional
    unit suffix (b/k/m/g/t/p, with or without trailing 'b'); a plain
    number means bytes. Raises ValueError on anything else."""
    s = str(v).strip().lower()
    units = {"b": 1}
    for i, prefix in enumerate("kmgtp"):
        units[prefix] = 1 << (10 * (i + 1))
        units[prefix + "b"] = 1 << (10 * (i + 1))
    for suffix, mult in sorted(units.items(), key=lambda kv: -len(kv[0])):
        if s.endswith(suffix):
            return int(float(s[: -len(suffix)]) * mult)
    return int(float(s))


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
    Spark's split-packing formula, or "driver-local" for
    createDataFrame-style leaves) — no plan→RDD conversion, no cache to
    go stale. Frames whose width is shuffle-determined (joins,
    aggregates, repartitions anywhere below) are widened only when the
    session's ``spark.sql.shuffle.partitions`` — the width that shuffle
    produced — is itself narrower than the cluster's parallelism; a
    frame already shuffled to ≥ core-count width is returned untouched
    (no extra exchange)."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        est = _estimated_scan_partitions(df)
    except Exception:
        est = None
    if est is None:
        try:
            shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions", str(target)))
        except ValueError:
            shuffle_parts = target
        if shuffle_parts < target:
            return df.repartition(target)
        return df
    if est < target:
        return df.repartition(target)
    return df
