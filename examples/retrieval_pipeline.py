"""End-to-end retrieval pipeline — a worked example that composes the
library's retrieval operators into the standard RAG-over-a-corpus shape:

    chunk → chunk-level BM25 (lexical lane)
    embed store → ANN index (IVF cells) → dense top-k (semantic lane)
    → index selection as measurement (the five-tier recall scoreboard:
      IVF / LSH / IVFADC / PQ / BQ), with the 1-bit BQ + exact-rescore
      lane shown as the tight-memory swap-in
    → reciprocal-rank fusion of the two lanes
    → leakage-safe eval split of the corpus (so retrieval eval queries
      never hit near-duplicates of their own training docs)

Every stage is the SAME operator the correctness registry hash-checks
against DuckDB (docs_chunk_bm25, emb_ivf_topk, docs_rrf_fusion,
docs_leakage_split), so the pipeline's output is bit-reproducible
across reruns, partitionings, and engines. Run it against any sf dir:

    PYTHONPATH=. python examples/retrieval_pipeline.py [sf_dir]

At cluster scale the only changes are the session and the input path:
BM25 builds its inverted index only for the queried terms, the dense
lane scans one IVF cell subset instead of the corpus, and the fusion
touches only the two already-cut top-k lists.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F


def run_retrieval(spark, sf_dir: str, query_terms=None, probe_id: int = 7, k: int = 10):
    """Returns (fused top-k frame, dict of stage summaries)."""
    from graph_loom_spark.ops import dedup as D
    from graph_loom_spark.ops import simsearch as S
    from graph_loom_spark.ops import text as T

    query_terms = query_terms or ["vector", "join", "scan"]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    info: dict = {"corpus_docs": docs.count()}

    # 1. lexical lane: whole-document BM25 top-20 for the query terms
    #    (swap in chunk_documents + bm25_topk(id_col="chunk_id") for the
    #    chunk-granularity variant the registry checks as docs_chunk_bm25)
    bm = T.bm25_topk(docs, query_terms, k=20)
    info["bm25_candidates"] = bm.count()

    # 2. dense lane: IVF-flat ANN over the embedding store — fit the
    #    deterministic quantizer once, then probe nprobe of k cells
    assigned, cells = S.kmeans_fit(emb, k=16, iters=5)
    dense = S.ivf_flat_topk(
        emb, assigned, cells, probe_id=probe_id, k=k, nprobe=4
    ).select(F.col("vec_id").alias("doc_id"), "cosine")
    info["dense_candidates"] = dense.count()

    # 2b. index selection is a measurement, not a guess: the registry's
    #    emb_index_eval scoreboard ranks all five tiers on recall@10
    #    (this corpus: IVF 0.8 > LSH/IVFADC 0.5 > PQ 0.4 > BQ 0.2) —
    #    at a tighter memory budget, swap the dense lane for the 1-bit
    #    signatures + exact rescoring (bq_rerank_topk), or ivfpq_topk
    #    for the FAISS-style IVFADC middle ground; the fusion below is
    #    lane-agnostic. Report how much the cheap lane agrees:
    bq = S.bq_rerank_topk(emb, probe_id=probe_id, k=k, candidates=50)
    info["bq_rerank_overlap_with_ivf"] = (
        bq.select("vec_id").join(dense.withColumnRenamed("doc_id", "vec_id"), "vec_id", "left_semi").count()
    )

    # 3. fuse by rank (scores are incommensurable): integer RRF
    fused = T.rrf_fuse([(bm, "bm25"), (dense, "cosine")], k=k, c=60)

    # 4. leakage-safe corpus split for retrieval eval: near-duplicate
    #    docs share one split, so an eval query's gold doc can't leak a
    #    near-copy into the index built from train
    split = D.leakage_safe_split(docs)
    info["split_sizes"] = {
        r["split"]: r["n"]
        for r in split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    return fused, info


def main() -> None:
    from graph_loom_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(
        app_name="retrieval-pipeline", master="local[4]", shuffle_partitions=4
    )
    spark.sparkContext.setLogLevel("ERROR")
    fused, info = run_retrieval(spark, sf_dir)
    top = [(r["doc_id"], r["rrf_micro"], r["n_lists"]) for r in fused.collect()]
    print({**info, "fused_topk": top})


if __name__ == "__main__":
    main()
