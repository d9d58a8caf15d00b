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
