"""Scratch profiler for weighted LPA at sf0.1 — per-round wall times."""
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
n_nodes = g.nodes.count()
n_edges = g.edges.count()
parts = int(max(spark.sparkContext.defaultParallelism, (n_nodes + 2 * n_edges) // 500_000))
spark.conf.set("spark.sql.shuffle.partitions", str(parts))
print(f"parts={parts}", flush=True)

t0 = time.time()
idmap = g.nodes.select("id", F.xxhash64("id").alias("iid")).localCheckpoint(eager=True)
print(f"idmap: {time.time()-t0:.2f}s", flush=True)
t0 = time.time()
weights = analytics._hashed_weights(g).repartition(parts, "v").localCheckpoint(eager=True)
print(f"weights: {time.time()-t0:.2f}s", flush=True)
comm = idmap.select(F.col("iid").alias("id"), F.col("iid").alias("community")).localCheckpoint(eager=True)

for rnd in range(8):
    t0 = time.time()
    scores = (
        weights.join(comm.select(F.col("id").alias("v"), F.col("community").alias("c")), "v")
        .groupBy("u", "c")
        .agg(F.sum("w").alias("score"))
    )
    best = (
        scores.groupBy("u")
        .agg(F.min(F.struct((-F.col("score")).alias("ns"), F.col("c").alias("c"))).alias("__b"))
        .select(F.col("u").alias("id"), F.col("__b.c").alias("new_community"))
    )
    nxt = (
        comm.join(best, "id", "left")
        .select(
            "id",
            F.coalesce("new_community", "community").alias("community"),
            (F.coalesce("new_community", "community") != F.col("community")).alias("__chg"),
        )
    ).localCheckpoint(eager=True)
    t1 = time.time()
    changed = nxt.filter(F.col("__chg")).count()
    comm = nxt.drop("__chg")
    print(f"round {rnd}: checkpoint {t1-t0:.2f}s count {time.time()-t1:.2f}s changed={changed}", flush=True)
    if changed == 0:
        break

t0 = time.time()
out = (
    comm.join(idmap.select(F.col("iid").alias("id"), F.col("id").alias("__sid")), "id")
    .join(idmap.select(F.col("iid").alias("community"), F.col("id").alias("__scomm")), "community")
    .select(F.col("__sid").alias("id"), F.col("__scomm").alias("community"))
)
print(f"map-back ({out.count()} rows): {time.time()-t0:.2f}s", flush=True)
spark.stop()
