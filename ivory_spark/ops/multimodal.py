"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side plumbing (schema, partition-friendly batch shapes,
Arrow-vectorized UDF signatures) is real and tested; the actual media
decode is STUBBED — codec libraries (Pillow/librosa/ffmpeg) are not in
this container. `decode_features` computes deterministic fake features
from the bytes so tests can pin behavior end-to-end; `decode_real` raises
NotImplementedError and documents the integration point.

Design for 100 TB: media bytes stay in an opaque `binary` column with a
typed metadata struct alongside; feature extraction streams through
mapInPandas so one Arrow batch (not one row, not one partition) is the
unit of Python-side work, and `spark.sql.execution.arrow.maxRecordsPerBatch`
bounds peak memory per task regardless of blob size.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def synthesize_media(spark, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media: payload = utf-8 bytes of the text, typed
    metadata derived from its length. Stands in for real blob ingestion."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        (F.length(text_col) % 1920).cast("int").alias("width"),
        (F.length(text_col) % 1080).cast("int").alias("height"),
        (F.length(text_col) * 10).cast("int").alias("duration_ms"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


FEATURE_DIM = 8


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: 8 floats from the
    sha256 digest. Replace with image-decode + model features in prod."""
    digest = hashlib.sha256(payload).digest()
    return (
        np.frombuffer(digest[: FEATURE_DIM * 4], dtype="<u4").astype(np.float64)
        / np.float64(2**32)
    ).astype(np.float32)


def decode_features(media: DataFrame) -> DataFrame:
    """(media_id, kind, n_bytes, features: array<float>) via mapInPandas.
    The batch loop is the real production shape; only the per-blob
    transform is a stub."""

    def gen(batches):
        for pdf in batches:
            feats = [ _fake_features(bytes(p)) for p in pdf["payload"] ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "features": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(
        gen, schema="media_id long, kind string, n_bytes long, features array<float>"
    )


def explode_features(features: DataFrame, round_dp: int = 6) -> DataFrame:
    """Gate/audit shape: one row per (media_id, dim) with the feature as a
    rounded scalar double — arrays are unhashable for sorted comparisons,
    so the correctness gate consumes this exploded form. The float32
    feature is promoted to double (exact) before rounding, which an
    independent SQL engine can reproduce bit-for-bit."""
    return features.select(
        "media_id",
        "kind",
        "n_bytes",
        F.posexplode("features").alias("dim", "feature"),
    ).withColumn("feature", F.round(F.col("feature").cast("double"), round_dp))


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame timestamp to decode
    (JVM-side sequence explode); the decode itself is the stubbed step."""
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ms"),
    )
    return frames


def decode_real(media: DataFrame) -> DataFrame:
    """Integration point for real decoders (Pillow / torchaudio / pyav).

    Not available in this environment — the container ships no media
    codecs. The Arrow plumbing to use is identical to decode_features.
    """
    raise NotImplementedError(
        "media codecs not installed in this environment; "
        "use decode_features (deterministic stub) for plumbing tests"
    )


def resize_stub(
    media: DataFrame, target_w: int = 224, target_h: int = 224, sig_bytes: int = 64
) -> DataFrame:
    """Image-resize plumbing (the brief's resize step): mapInPandas over
    Arrow batches with the real production schema — (media_id, src/target
    dims, scale factors, resized payload). The pixel resample itself is
    the stubbed step (no codecs in the container): the output payload is
    a deterministic even-stride byte sample of the source payload, which
    preserves the real operator's shape (fixed-size output rows whose
    bytes depend on the full input payload) for partitioning/memory
    tests."""

    def gen(batches):
        for pdf in batches:
            rows = {
                "media_id": pdf["media_id"],
                "src_w": pdf["width"],
                "src_h": pdf["height"],
                "target_w": pd.Series([target_w] * len(pdf), dtype="int32"),
                "target_h": pd.Series([target_h] * len(pdf), dtype="int32"),
            }
            sx, sy, payloads = [], [], []
            for w, h, p in zip(pdf["width"], pdf["height"], pdf["payload"]):
                sx.append(float(target_w) / max(int(w), 1))
                sy.append(float(target_h) / max(int(h), 1))
                b = bytes(p)
                if len(b) <= sig_bytes:
                    payloads.append(b)
                else:
                    idx = np.linspace(0, len(b) - 1, sig_bytes).astype(np.int64)
                    payloads.append(bytes(np.frombuffer(b, dtype=np.uint8)[idx]))
            rows["scale_x"] = pd.Series(sx, dtype="float64")
            rows["scale_y"] = pd.Series(sy, dtype="float64")
            rows["payload"] = payloads
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "image").mapInPandas(
        gen,
        schema=(
            "media_id long, src_w int, src_h int, target_w int, target_h int, "
            "scale_x double, scale_y double, payload binary"
        ),
    )
