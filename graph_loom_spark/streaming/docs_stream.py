"""Structured Streaming document-ingestion operators (extension surface;
the reference has no streaming — SURVEY §2.11).

``stream_exact_dedup`` is the streaming twin of ``ops.dedup.exact_dedup``
for an ingestion pipeline: as documents arrive, emit only the first
occurrence of each exact text. Dedup state is keyed by the same compact
96-bit content hash as the batch operator (12 bytes/doc of state, never
the document bytes), and an event-time watermark bounds how long a key
is remembered — the standard state-retention trade for unbounded
streams: duplicates farther apart than the watermark horizon are
re-emitted, exactly like ``dropDuplicates`` documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def read_docs_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a documents parquet dir."""
    reader = spark.readStream.schema(DOCS_RAW_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def stream_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """First-occurrence exact dedup over a document stream.

    Keys on ``(xxhash64(text), murmur3(text))`` — the batch operator's
    96-bit content key — so the dedup state never stores document
    bytes. With ``ts_col`` the state is watermark-bounded via
    ``dropDuplicatesWithinWatermark`` (duplicates within the horizon are
    suppressed regardless of their exact timestamps; keys expire after
    it); without it the state grows with distinct keys (12 bytes each),
    the all-history-exact mode.
    """
    keyed = docs.withColumn("__k64", F.xxhash64(text_col)).withColumn(
        "__k32", F.hash(text_col)
    )
    if ts_col is not None:
        keyed = keyed.withWatermark(ts_col, watermark)
        return keyed.dropDuplicatesWithinWatermark(["__k64", "__k32"]).drop(
            "__k64", "__k32"
        )
    return keyed.dropDuplicates(["__k64", "__k32"]).drop("__k64", "__k32")


def stream_minhash_dedup(
    docs: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    bands: int = 8,
    num_perm: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Incremental NEAR-duplicate dedup for an ingestion stream — the
    actual LLM-corpus shape: as documents arrive, drop any whose
    estimated Jaccard (MinHash, same signatures/banding as the batch
    ``ops.dedup`` operators) reaches ``threshold`` against an
    already-seen document; survivors land in ``out_dir``.

    Mechanics (``foreachBatch``, since the candidate join + estimate
    filter is not expressible in a single stateful streaming op):

    1. signature each micro-batch (``minhash_signatures`` — the batch
       operator, JVM expressions only);
    2. band-join the new signatures against the parquet-backed
       signature index of every previously seen doc (state is
       ``num_perm`` longs/doc — never document bytes; at cluster scale
       this directory is a Delta/Iceberg table partitioned by band and
       the new-batch side is broadcast);
    3. drop newcomers at est-Jaccard ≥ threshold vs the index, or vs an
       earlier (smaller-id) doc in the same batch — arrival order is
       precedence, the standard first-seen-wins ingestion rule;
    4. append survivors to ``out_dir`` and ALL new signatures (kept or
       dropped — precedence must not resurrect near-dups of dropped
       docs' own near-dups... it must match the batch rule: a doc is
       dropped iff SOME earlier doc collides, kept or not) to the index.

    When documents arrive in id order, the accumulated ``out_dir``
    equals the batch rule "keep doc d iff no banded pair (a, d) with
    a < d at est ≥ threshold" computed from ``minhash_lsh_pairs`` over
    the whole corpus — asserted in tests/test_streaming.py.
    """
    from graph_loom_spark.ops.dedup import minhash_lsh_pairs, minhash_signatures

    if num_perm % bands != 0:
        raise ValueError(f"bands ({bands}) must divide num_perm ({num_perm})")
    rows_per_band = num_perm // bands

    def _banded(sig: DataFrame, idc: str) -> DataFrame:
        return sig.select(
            F.col(idc),
            "signature",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(bi).alias("band"),
                            F.hash(
                                F.slice("signature", bi * rows_per_band + 1, rows_per_band)
                            ).alias("bh"),
                        )
                        for bi in range(bands)
                    ]
                )
            ).alias("b"),
        ).select(F.col(idc), "signature", "b.band", "b.bh")

    def _process(batch_df: DataFrame, _batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        batch_df = batch_df.localCheckpoint(eager=True)
        sigs = minhash_signatures(
            batch_df, text_col=text_col, id_col=id_col, num_perm=num_perm
        ).localCheckpoint(eager=True)
        # --- vs the prior index
        try:
            prior = spark.read.parquet(index_dir)
            have_prior = not prior.isEmpty()
        except Exception:  # first batch: no index yet
            have_prior = False
        dropped = None
        if have_prior:
            new_b = _banded(sigs, id_col)
            old_b = _banded(prior, "__old_id")
            est = F.size(
                F.filter(F.zip_with("signature", "__old_sig", lambda x, y: x == y), lambda v: v)
            ) / F.size(F.col("signature"))
            dropped = (
                new_b.join(
                    old_b.select(
                        "band", "bh", F.col("signature").alias("__old_sig")
                    ),
                    ["band", "bh"],
                )
                .filter(est >= threshold)
                .select(F.col(id_col))
                .distinct()
            )
        # --- vs earlier docs in the same batch (arrival precedence)
        intra = (
            minhash_lsh_pairs(
                sigs, id_col=id_col, bands=bands, threshold=threshold, num_perm=num_perm
            )
            .select(F.col("id_b").alias(id_col))
            .distinct()
        )
        dropped = intra if dropped is None else dropped.unionByName(intra).distinct()
        kept = batch_df.join(dropped, id_col, "left_anti")
        kept.write.mode("append").parquet(out_dir)
        sigs.withColumnRenamed(id_col, "__old_id").write.mode("append").parquet(index_dir)

    return (
        docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
