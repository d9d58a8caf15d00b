"""Scratch profiler for connected_components at sf0.1 — per-phase wall times.

Mirrors analytics.connected_components step by step so the 30 s bench
number can be attributed: pre-counts, adjacency persist, per-level
contraction, unwind, final string-id mapping.
"""
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from graph_loom_spark.io.tpch_graph import build_graph
from graph_loom_spark import analytics

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "100g")
    .config("spark.sql.adaptive.enabled", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

g = build_graph(spark, "/root/testdata/sf0.1", cache=False)
g.edges.count()  # projection warm-up (liseq parquet build), untimed

T0 = time.time()
t0 = time.time()
n_edges = 2 * g.edges.count()
print(f"edge count: {time.time()-t0:.2f}s  ({n_edges//2} edges)", flush=True)
t0 = time.time()
n_nodes = g.nodes.count()
print(f"node count: {time.time()-t0:.2f}s  ({n_nodes} nodes)", flush=True)
parts = int(max(8, (n_nodes + n_edges) // 500_000))
spark.conf.set("spark.sql.shuffle.partitions", str(parts))
print(f"parts={parts}", flush=True)

t0 = time.time()
sadj = analytics._directed_adjacency(g.edges)
adj = (
    sadj.select(F.xxhash64("u").alias("u"), F.xxhash64("v").alias("v"))
    .repartition(parts, "u")
    .persist()
)
adj.count()
print(f"adjacency persist: {time.time()-t0:.2f}s", flush=True)

t0 = time.time()
idmap = g.nodes.select("id", F.xxhash64("id").alias("iid")).localCheckpoint(eager=True)
print(f"idmap ckpt: {time.time()-t0:.2f}s", flush=True)

bcast = F.broadcast
levels = []
cur = adj
for lvl in range(30):
    t0 = time.time()
    m = (
        cur.groupBy("u")
        .agg(F.min("v").alias("__mv"))
        .select("u", F.least("u", "__mv").alias("m"))
        .localCheckpoint(eager=True)
    )
    t1 = time.time()
    levels.append(m)
    contracted = (
        cur.join(bcast(m.select("u", F.col("m").alias("__mu"))), "u")
        .join(bcast(m.select(F.col("u").alias("v"), F.col("m").alias("__mv2"))), "v")
        .select(F.col("__mu").alias("u"), F.col("__mv2").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .repartition("u")
        .distinct()
        .localCheckpoint(eager=True)
    )
    t2 = time.time()
    cur = contracted
    empty = contracted.isEmpty()
    print(
        f"level {lvl}: m {t1-t0:.2f}s contract {t2-t1:.2f}s isEmpty {time.time()-t2:.2f}s",
        flush=True,
    )
    if empty:
        break

t0 = time.time()
root = None
for m in reversed(levels):
    if root is None:
        root = m.select("u", F.col("m").alias("root"))
    else:
        root = m.join(bcast(root.withColumnRenamed("u", "m")), "m", "left").select(
            "u", F.coalesce("root", F.col("m")).alias("root")
        )
comp = idmap.join(bcast(root.withColumnRenamed("u", "iid")), "iid", "left").select(
    "id", "iid", F.coalesce("root", F.col("iid")).alias("__hc")
)
rep = comp.groupBy("__hc").agg(F.min("id").alias("component"))
result = comp.join(rep, "__hc").select("id", "component").localCheckpoint(eager=True)
print(f"unwind+stringmap+ckpt: {time.time()-t0:.2f}s", flush=True)
print(f"TOTAL {time.time()-T0:.2f}s  rows={result.count()}", flush=True)
