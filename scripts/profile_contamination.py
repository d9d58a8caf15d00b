"""Decomposition profile for the contamination pair (VERDICT r13 ask
#7): is the cost really "the declared md5/xxhash gram arithmetic", or is
something structural hiding in the plan? Times four nested slices of
docs_bloom_contamination's probe and three of docs_contamination's scan,
each noop-forced min-of-N in one session:

  bloom: A tokenize-only -> B +gram build -> C +k md5 positions -> D full probe
  flags: A tokenize-only -> B +gram xxhash -> C full query (join+flags)

The per-stage deltas attribute the wall time; written to
assets/profile_contamination_r14.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
N, M_BITS, K = 8, 16384, 3

from graph_loom_spark.session import get_spark  # noqa: E402

cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark(
    app_name="contamination-profile",
    master=f"local[{cpus}]",
    shuffle_partitions=int(cpus) if cpus.isdigit() else None,
)
spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
import __spark_entry__ as entry  # noqa: E402

spark.range(100_000).selectExpr("sum(id)").collect()
docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
docs.count()

toks = "split(regexp_replace(lower(trim(text)), '\\\\s+', ' '), ' ')"
grams = (
    f"array_distinct(transform(sequence(0, greatest(size({toks}) - {N}, 0)), "
    f"i -> array_join(slice({toks}, i + 1, {N}), ' ')))"
)
pos = (
    f"(cast(conv(substr(md5(concat(cast(j as string), ':', g)), 1, 8), 16, 10) "
    f"as bigint) % {M_BITS})"
)
md5_positions = (
    f"aggregate({grams}, 0L, (acc, g) -> acc + "
    f"aggregate(transform(array(0, 1, 2), j -> {pos}), 0L, (a, p) -> a + p))"
)
xxh_grams = (
    f"aggregate(transform(sequence(0, greatest(size({toks}) - {N}, 0)), "
    f"i -> xxhash64(concat_ws(' ', slice({toks}, i + 1, {N})))), 0L, "
    "(a, x) -> a ^ x)"  # xor: hash sums overflow ANSI long addition
)

stages = {
    "tokenize_only": docs.select(F.expr(f"size({toks})").alias("x")),
    "gram_build": docs.select(F.expr(f"size({grams})").alias("x")),
    "gram_md5_positions": docs.select(F.expr(md5_positions).alias("x")),
    "gram_xxhash": docs.select(F.expr(xxh_grams).alias("x")),
}
qs = entry.queries()
results: dict = {"sf_dir": SF_DIR, "runs": RUNS, "stages": {}, "queries": {}}
for name, df in stages.items():
    times = []
    for _ in range(RUNS):
        spark.sparkContext.setJobDescription(f"contamination-profile:{name}")
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        times.append(round(time.time() - t0, 3))
    results["stages"][name] = {"runs": times, "min": min(times)}
    print(name, times, flush=True)
for qname in ("docs_bloom_contamination", "docs_contamination"):
    times = []
    for _ in range(RUNS):
        entry.reset_memo(qname)
        bench._drop_persisted_blocks(spark)
        spark.sparkContext.setJobDescription(f"contamination-profile:{qname}")
        t0 = time.time()
        qs[qname](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        times.append(round(time.time() - t0, 3))
    results["queries"][qname] = {"runs": times, "min": min(times)}
    print(qname, times, flush=True)

out = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets",
    "profile_contamination_r14.json",
)
with open(out, "w") as fh:
    json.dump(results, fh, indent=1, sort_keys=True)
print("wrote", out)
