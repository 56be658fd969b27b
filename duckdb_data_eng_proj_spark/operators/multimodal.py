"""Multimodal columns: opaque binary payloads + Arrow-batched decode.

Design (north-star requirement, BASELINE.json): image/audio/video
content rides in the relational model as an opaque ``binary`` column
plus typed metadata columns. All heavy per-item work (decode, feature
extraction, resize, frame sampling) runs as ``mapInPandas`` over
Arrow batches — the Spark-side plumbing (schema, batch shape,
partition-preserving narrow execution) is real and tested here.

The actual codec step is STUBBED: this container has no image/audio
libraries, so ``decode_image`` raises NotImplementedError and the
pipeline uses ``fake_decode_features`` — a deterministic stand-in
keyed on the payload's md5 — instead. Swapping in a real decoder
changes ONE function; the plan shape (scan → narrow mapInPandas →
downstream relational ops) is unchanged.

Scale notes: mapInPandas is narrow (no shuffle); batch size is
governed by spark.sql.execution.arrow.maxRecordsPerBatch — for
multi-MB payloads set it low (e.g. 64) so a batch fits in memory.
Binary payloads at 100 TB should live in parquet with a small
row-group size, or as object-store pointers with the decode UDF
fetching lazily.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("media_type", StringType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("content_md5", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def decode_image(payload: bytes) -> object:
    """Real image decode — requires an imaging library not present in
    this container. The plumbing around it is fully functional; swap
    this implementation to go live."""
    raise NotImplementedError(
        "image codec not available in this environment; "
        "use fake_decode_features for the deterministic test path"
    )


def fake_decode_features(payload: bytes) -> tuple[str, int, int]:
    """Deterministic stand-in for decode: md5 + pseudo dimensions
    derived from the digest (mirrors the oracle SQL exactly)."""
    digest = hashlib.md5(payload).hexdigest()
    width = int(digest[0:4], 16) % 1920 + 1
    height = int(digest[4:8], 16) % 1080 + 1
    return digest, width, height


def attach_payload(documents: DataFrame) -> DataFrame:
    """Build a media table from documents: utf-8 text bytes stand in
    for an image payload (binary column + typed metadata)."""
    return documents.select(
        "doc_id",
        F.lit("image/fake").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches of payloads."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [fake_decode_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "content_md5": [f[0] for f in feats],
                    "width": pd.Series([f[1] for f in feats], dtype="int32"),
                    "height": pd.Series([f[2] for f in feats], dtype="int32"),
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("content_md5", StringType(), True),
        StructField("n_samples", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("out_samples_8k", LongType(), True),
    ]
)

_PCM_RATE = 16_000  # fake payloads are treated as 16-bit mono @ 16 kHz


def decode_audio(payload: bytes) -> object:
    """Real audio decode — requires an audio library not present in
    this container. Swap this implementation to go live; the
    mapInPandas plumbing around it is fully functional."""
    raise NotImplementedError(
        "audio codec not available in this environment; "
        "use extract_audio_features' deterministic fake path"
    )


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Audio-path mapInPandas: payload treated as 16-bit mono PCM at
    16 kHz (deterministic fake in place of a real codec): sample
    count, duration, and the 2:1 downsample (16 k → 8 k) output size —
    the resample PLAN is real arithmetic; only the waveform math is
    stubbed. Narrow stage, no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n_bytes = pdf["payload"].map(len).astype("int64")
            n_samples = n_bytes // 2
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "content_md5": [
                        hashlib.md5(p).hexdigest() for p in pdf["payload"]
                    ],
                    "n_samples": n_samples,
                    "duration_ms": n_samples * 1000 // _PCM_RATE,
                    "out_samples_8k": (n_samples + 1) // 2,
                }
            )

    return media.mapInPandas(batches, schema=AUDIO_FEATURE_SCHEMA)


def sample_frames(features: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plan for video payloads: pretend each item has
    n_bytes/100 frames, emit every ``every_n``-th index. Pure builtin
    (sequence + explode) — sampling needs no Python; only the decode
    of the *sampled* frames would, downstream."""
    n_frames = (F.col("n_bytes") / 100).cast("int") + 1
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return features.select(
        "doc_id", F.explode(idx).alias("frame_idx"), "content_md5"
    )
