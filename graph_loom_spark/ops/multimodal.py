"""Multimodal (image/audio/video) column operators for training-data
pipelines.

Media is carried as an opaque ``binary`` column plus typed metadata
(mime, width/height, sample rate, duration). All Spark-side plumbing —
schemas, Arrow-batched ``mapInPandas`` pipelines, partition sizing — is
real and tested; the actual codec calls are stubbed behind
``_decode_stub`` (the container ships no image/audio libraries) with a
deterministic fake so tests can assert end-to-end behavior. Swap
``_decode_stub`` for Pillow/torchaudio/pyav in production.

Scale notes: media rows are large; pipelines below use ``mapInPandas``
(one Arrow batch at a time, bounded memory) and repartition by a size
budget, never ``collect``. Feature extraction emits fixed-width vectors
so downstream joins/aggregations stay columnar.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("data", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("phash", T.StringType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def _decode_stub(data: bytes) -> dict:
    """Deterministic fake decoder. Real deployments replace this with a
    codec call (Pillow / pyav); everything downstream only sees the dict.

    Raises like a real decoder would on missing payloads.
    """
    if data is None:
        raise NotImplementedError("no payload: real decoder required")
    h = hashlib.sha256(data).digest()
    return {
        "width": 16 + h[0] % 64,
        "height": 16 + h[1] % 64,
        "phash": h[:8].hex(),
    }


def image_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract images: Arrow-batched ``mapInPandas``.

    The per-batch loop is the pattern for any Python-side media codec:
    one pandas batch in, one out, no per-row Python UDF dispatch.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                try:
                    d = _decode_stub(bytes(data) if data is not None else None)
                    rows.append(
                        (mid, d["width"], d["height"], len(data), d["phash"])
                    )
                except NotImplementedError:
                    rows.append((mid, None, None, None, None))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_bytes", "phash"]
            )

    return media.select("media_id", "data").mapInPandas(extract, IMAGE_FEATURES_SCHEMA)


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize pipeline plumbing: same schema in/out, records the target
    size in ``meta``. The byte transform is the stub (real: PIL resize);
    partitioning/batching/meta handling are the real pattern."""

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for meta in pdf["meta"]:
                m = dict(meta) if meta is not None else {}
                m["resized_max_side"] = str(max_side)
                metas.append(m)
            pdf = pdf.assign(meta=metas)
            yield pdf

    return media.mapInPandas(do_resize, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10, max_frames: int = 4) -> DataFrame:
    """Video frame sampling plumbing: one input row → ≤ ``max_frames``
    output rows (media_id, frame_index, frame bytes). The frame split is
    stubbed as fixed-size byte slices; a real build calls the demuxer in
    the same loop shape."""

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                if data is None:
                    continue
                raw = bytes(data)
                # stub demux: treat every 64-byte block as a "frame"
                n_blocks = max(len(raw) // 64, 1)
                taken = 0
                for i in range(0, n_blocks, every_n):
                    if taken >= max_frames:
                        break
                    out.append((mid, i, raw[i * 64 : (i + 1) * 64]))
                    taken += 1
            yield pd.DataFrame(out, columns=["media_id", "frame_index", "frame"])

    return media.select("media_id", "data").mapInPandas(split, FRAME_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata stats (no decode): per-mime count + byte stats.
    The cheap pre-pass a pipeline runs before deciding what to decode."""
    return (
        media.groupBy("mime")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.length("data")).cast("bigint").alias("total_bytes"),
            F.avg(F.length("data")).alias("avg_bytes"),
        )
    )


def synthetic_media(spark, n: int = 64, partitions: int = 4) -> DataFrame:
    """Deterministic fake media table for tests/demos: payload bytes are
    a pure function of media_id."""
    return (
        spark.range(n)
        .repartition(partitions)
        .select(
            F.concat(F.lit("m"), F.lpad(F.col("id").cast("string"), 6, "0")).alias("media_id"),
            F.when(F.col("id") % 3 == 0, F.lit("image/png"))
            .when(F.col("id") % 3 == 1, F.lit("audio/wav"))
            .otherwise(F.lit("video/mp4"))
            .alias("mime"),
            F.repeat(F.sha2(F.col("id").cast("string"), 256), 8).cast("binary").alias("data"),
            F.create_map(F.lit("source"), F.lit("synthetic"))
            .cast("map<string,string>")  # align valueContainsNull with MEDIA_SCHEMA
            .alias("meta"),
        )
    )
