"""Multimodal column plumbing: media as opaque binary + typed metadata.

The interleaved input schema carries ``media`` spans by reference
(``media_ref``). This module provides the Spark-side plumbing a real
pipeline needs — materializing a media table, batch decode / feature
extraction via ``mapInPandas`` — with the actual codec work STUBBED
(image/audio libraries are not in this environment):

* ``decode_media(df, fake=False)`` raises NotImplementedError per batch
  unless ``fake=True``, which produces a deterministic fake decode
  (dimensions/duration derived from a crc of the bytes) so the schema,
  partitioning, UDF signature and batch shape are real and tested.

A production deployment swaps ``_fake_decode`` for PIL/ffmpeg calls; the
dataflow (columnar binary in Arrow batches, metadata struct out) does
not change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)


def media_table_from_docs(docs: DataFrame) -> DataFrame:
    """Materialize (media_ref, payload binary) from the docs' media spans.

    Payload bytes are synthesized deterministically from the ref (the
    sandbox has no object store); in production this is a binary-file
    datasource read (``spark.read.format('binaryFile')``).
    """
    refs = (
        docs.select(
            F.explode(
                F.filter("spans", lambda s: s["kind"] == F.lit("media"))
            ).alias("s")
        )
        .select(F.col("s.media_ref").alias("media_ref"))
        .filter(F.col("media_ref").isNotNull())
        .distinct()
    )
    # deterministic fake payload: repeat of the ref's utf-8 bytes
    return refs.withColumn(
        "payload",
        F.encode(F.substring(F.repeat(F.col("media_ref"), 8), 1, 256), "utf-8"),
    )


def _fake_decode(ref: str, payload: bytes) -> dict:
    # digest = low 64 bits of md5 (bytes 8..16 little-endian) — the exact
    # value DuckDB's md5_number_lower computes, so the fake decode has a
    # cross-engine oracle; checksum folded to 31 bits to stay in int range
    h = int.from_bytes(hashlib.md5(payload or b"").digest()[8:], "little")
    kind = "image" if (h & 1) == 0 else "video"
    return {
        "media_ref": ref,
        "n_bytes": len(payload or b""),
        "checksum": int(h % (1 << 31)),
        "kind": kind,
        "width": int(16 + (h >> 8) % 4096),
        "height": int(16 + (h >> 20) % 2160),
        "duration_ms": 0 if kind == "image" else int(1000 + h % 600000),
    }


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Batch decode/feature-extract media payloads.

    Real decode is NOT implemented in this environment; pass fake=True
    for the deterministic stand-in (same schema / batching / plan shape).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires image/audio codecs not present in "
                    "this environment; pass fake=True for the deterministic stub"
                )
            yield pd.DataFrame(
                [
                    _fake_decode(r, p)
                    for r, p in zip(pdf["media_ref"], pdf["payload"])
                ]
            )

    return media.mapInPandas(run, schema=MEDIA_META_TYPE)


def frame_sample_plan(meta: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Plan frame-sampling work items for videos: one row per frame to
    extract. Pure built-ins (sequence + explode); the actual frame grab
    would be another mapInPandas over (media_ref, ts_ms) batches."""
    vids = meta.filter(F.col("kind") == "video")
    return vids.select(
        "media_ref",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
