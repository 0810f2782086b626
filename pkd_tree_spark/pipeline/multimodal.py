"""Multimodal columns: media spans as opaque binary + typed metadata.

The container has no image/audio codecs, so the decode step is a STUB: the
Spark-side plumbing (schema, partitioning, Arrow batch shape, mapInPandas
signature) is real and tested, while the byte-level decode is a
deterministic fake derived from the media handle. A real deployment swaps
``_fake_decode_batch`` for PIL/ffmpeg calls — same dataflow.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["media_spans", "with_media_binary", "decode_media_stub"]

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("span_idx", T.IntegerType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
    ]
)


def media_spans(docs: DataFrame) -> DataFrame:
    """Explode kind='media' spans: (doc_id, span_idx, media_ref)."""
    return (
        docs.select("doc_id", F.posexplode_outer("spans").alias("span_idx", "span"))
        .where(F.col("span.kind") == "media")
        .select("doc_id", F.col("span_idx").cast("int").alias("span_idx"), F.col("span.media_ref").alias("media_ref"))
    )


def with_media_binary(media: DataFrame) -> DataFrame:
    """Attach an opaque ``content: binary`` column. Here the bytes are a
    deterministic expansion of the handle (encode(repeat(ref))); in
    production this is the object-store fetch. The column is a real
    BinaryType so everything downstream exercises binary handling."""
    payload = F.repeat(F.col("media_ref"), 4)
    return media.withColumn("content", F.encode(payload, "utf-8"))


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for a codec: derive (width, height, n_frames)
    from the 48-bit handle in media_ref ('media://%016x'). A real decoder
    would parse pdf['content'] bytes here (PIL.Image.open / av.open) —
    NotImplementedError is what you'd hit without codecs, so we fake it
    deterministically instead and keep the Arrow plumbing honest."""
    h = pdf["media_ref"].str.slice(8).apply(int, base=16).astype("int64")
    out = pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "span_idx": pdf["span_idx"].astype("int32"),
            "media_ref": pdf["media_ref"],
            "n_bytes": pdf["content"].map(len).astype("int64"),
            "width": (320 + h % 1600).astype("int64"),
            "height": (240 + (h // 7) % 900).astype("int64"),
            "n_frames": (1 + h % 240).astype("int64"),
        }
    )
    return out


def decode_media_stub(media_with_bytes: DataFrame, batch_size: int = 1024) -> DataFrame:
    """mapInPandas decode stage: Arrow-batched, schema-stable, partition-
    preserving — the real shape a decode/feature-extract stage has at
    100 TB (one task per partition of media rows, codec work in batches)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            for start in range(0, len(pdf), batch_size):
                yield _fake_decode_batch(pdf.iloc[start : start + batch_size])

    return media_with_bytes.mapInPandas(gen, schema=DECODE_SCHEMA)
