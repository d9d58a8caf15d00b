"""End-to-end training-data curation pipeline — a worked example that
composes the library's operators into the standard LLM-data shape:

    HTML ingest (tag strip + boilerplate removal) → quality gate →
    PII scrub → exact dedup → near-dedup
    (MinHash-LSH candidates, exact-Jaccard rescore, canonical keep) →
    benchmark decontamination → source mixture → sequence packing →
    train/val/test split

Every stage is the SAME operator the correctness registry hash-checks
against DuckDB (the quality→dedup prefix is itself hash-checked as one
composed query: ``docs_pipeline_funnel``), so the pipeline's output is
bit-reproducible across reruns, partitionings, and engines. Run it
against any sf dir:

    PYTHONPATH=. python examples/curation_pipeline.py [sf_dir]

At cluster scale the only changes are the session (spark-submit to a
real master) and the input path — the operator chain is unchanged:
every stage is shuffle-bounded (hash joins/aggs on compact keys, no
global sorts; pair generation is banded/prefix-filtered, never
all-pairs; splits and mixtures are md5-derived pure projections that
need no membership tables).
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F


def run_pipeline(spark, sf_dir: str, mixture: dict | None = None, bench_ids: int = 5):
    """Returns a dict of stage-count ints plus the final frames."""
    from graph_loom_spark.ops import dedup as D
    from graph_loom_spark.ops import text as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = {"ingested": docs.count()}

    # 0. HTML ingest (the CCNet/RefinedWeb stage a web corpus starts
    #    from): the fixture ships clean text, so wrap each doc in a
    #    deterministic page (head + script/style junk, an <h1>, the
    #    body text entity-escaped in a <p>, an all-anchor nav div) and
    #    run the REAL stdlib-parser extractor — tag strip, entity
    #    decode, block assembly, link-density boilerplate removal. On
    #    a real crawl, point html_extract at the raw html column and
    #    delete the page-generation lines.
    from graph_loom_spark.ops import html as H

    esc = F.col("text")
    for src, dst in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")):
        esc = F.replace(esc, F.lit(src), F.lit(dst))
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit('<html><head><script>x=1</script></head><body><h1>'),
            F.col("source"),
            F.lit("</h1><p>"),
            esc,
            F.lit('</p><div><a href="/">Home</a> <a href="/a">About</a></div></body></html>'),
        ).alias("html"),
    )
    ext = H.html_extract(pages)
    counts["boiler_blocks_dropped"] = int(
        ext.agg(F.sum("n_boiler_blocks")).first()[0] or 0
    )
    docs = docs.drop("text", "n_chars").join(
        ext.select("doc_id", "text", F.col("text_chars").alias("n_chars")),
        "doc_id",
    )
    counts["after_html_extract"] = docs.count()

    # 1. quality gate: integer 0-3 heuristic (length band, token-length
    #    band, alpha ratio); keep score >= 2.
    q_keep = T.quality_score(docs).filter(F.col("quality_score") >= 2).select("doc_id")
    docs = docs.join(q_keep, "doc_id", "left_semi")
    counts["after_quality"] = docs.count()

    # 2. PII redaction in place (emails/phones/IPs -> typed tags) using
    #    the same patterns pii_scrub reports on (pii_scrub itself emits
    #    the per-doc counts + redacted fingerprint for the audit trail).
    red = F.col("text")
    for pat, tag in T.PII_PATTERNS.values():
        red = F.regexp_replace(red, pat, tag)
    docs = docs.withColumn("text", red)

    # 3. exact dedup: keep the first occurrence per content hash.
    docs = docs.join(
        D.exact_dedup(docs, ["text"]).select("doc_id"), "doc_id", "left_semi"
    )
    counts["after_exact_dedup"] = docs.count()

    # 4. near-dedup: MinHash-LSH candidates (recall) rescored with exact
    #    3-gram Jaccard (precision); keep each cluster's canonical
    #    (min-id) member.
    sigs = D.minhash_signatures_md5(docs)
    cand = D.minhash_lsh_pairs(sigs, threshold=0.3, band_hash="md5")
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.5, candidate_pairs=cand)
    keep = D.dedup_clusters(docs, pairs=pairs).filter(F.col("is_canonical")).select(
        "doc_id"
    )
    docs = docs.join(keep, "doc_id", "left_semi")
    counts["after_near_dedup"] = docs.count()

    # 5. benchmark decontamination: drop anything sharing a word 8-gram
    #    with the held-out set (here: doc_id < bench_ids stands in for a
    #    real benchmark corpus), and the held-out docs themselves.
    bench = docs.filter(F.col("doc_id") < bench_ids)
    flags = T.contamination_flags(docs, bench)
    docs = (
        docs.join(
            flags.filter(F.col("contaminated")).select("doc_id"),
            "doc_id",
            "left_anti",
        )
        .filter(F.col("doc_id") >= bench_ids)
    )
    counts["after_decontamination"] = docs.count()

    # 6. source mixture: md5-threshold sampling to per-source rates —
    #    reproducible manifests, no RNG state.
    mixture = mixture or {"src0": 1.0, "src1": 0.8, "src2": 0.5}
    kept = T.apply_mixture(docs, mixture).select("doc_id")
    mixed = docs.join(kept, "doc_id", "left_semi")
    counts["after_mixture"] = mixed.count()

    # 7. pack into fixed-token-budget sequences (concat-then-chunk).
    packed = T.pack_sequences(mixed, budget=512)
    counts["packed_docs"] = packed.count()

    # 8. deterministic md5-bucket split, re-derivable from the id alone.
    split = T.train_split(mixed, fractions={"train": 0.9, "val": 0.05, "test": 0.05})

    return counts, mixed, packed, split


def main() -> None:
    from graph_loom_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(
        app_name="curation-pipeline", master="local[4]", shuffle_partitions=4
    )
    spark.sparkContext.setLogLevel("ERROR")
    counts, mixed, packed, split = run_pipeline(spark, sf_dir)
    by_split = {
        r["split"]: r["n"]
        for r in split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # seq_idx is a 0-based PER-SHARD index, so the sequence count is the
    # number of distinct (shard, seq_idx) bins, not max(seq_idx).
    n_seqs = packed.agg(F.countDistinct("shard", "seq_idx")).collect()[0][0]
    print({**counts, "sequences": n_seqs, "split": by_split})


if __name__ == "__main__":
    main()
