"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side plumbing (schema, partition-friendly batch shapes,
Arrow-vectorized UDF signatures) is real and tested. Decode comes in two
tiers:

- `decode_real` / `resize_real`: REAL decode + pixel resample for the
  formats this container can handle without codec libraries — netpbm
  P6/P5 images (numpy) and RIFF/WAVE PCM audio (stdlib wave). Rows in
  compressed formats (jpeg/png/mp3/h264 — Pillow/librosa/ffmpeg are NOT
  in this container) come back decoded=false with the sniffed format,
  per-row, never a job abort; that remains the documented integration
  point for real codec libraries.
- `decode_features` / `resize_stub`: deterministic byte-derived stand-ins
  used by the correctness gate (sha256 features are DuckDB-reproducible;
  real pixel statistics are not).

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


def synthesize_real_media(spark, docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic VALID media blobs (for the real-decode tier): even
    doc_ids get a P6 gradient image (width/height from the id), odd ones
    a 16-bit PCM WAV sine (frequency from the id). Generated in Arrow
    batches — the same shape real blob ingestion would use."""
    import io
    import wave

    base = docs.select(F.col(id_col).alias("media_id"))

    def gen(batches):
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                if mid % 2 == 0:
                    w, h = 8 + mid % 16, 6 + mid % 12
                    yy, xx = np.mgrid[0:h, 0:w]
                    px = np.stack(
                        [
                            (xx * 255 // max(w - 1, 1)).astype(np.uint8),
                            (yy * 255 // max(h - 1, 1)).astype(np.uint8),
                            np.full((h, w), mid % 256, dtype=np.uint8),
                        ],
                        axis=2,
                    )
                    rows.append((mid, "image", "image/x-portable-pixmap",
                                 w, h, None, encode_ppm(px)))
                else:
                    rate, freq, n = 8000, 100 + (mid % 40) * 10, 800
                    t = np.arange(n, dtype=np.float64) / rate
                    x = (0.5 * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
                    buf = io.BytesIO()
                    with wave.open(buf, "wb") as wf:
                        wf.setnchannels(1)
                        wf.setsampwidth(2)
                        wf.setframerate(rate)
                        wf.writeframes(x.tobytes())
                    rows.append((mid, "audio", "audio/wav", None, None,
                                 1000 * n // rate, buf.getvalue()))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "mime", "width", "height",
                         "duration_ms", "payload"],
            )

    return base.mapInPandas(gen, schema=MEDIA_SCHEMA)


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


# ---------------------------------------------------------------------------
# real decode — uncompressed formats, zero external dependencies
# ---------------------------------------------------------------------------
# PPM/PGM (netpbm P6/P5) and RIFF/WAVE PCM are fully decodable with
# numpy + the stdlib `wave` module, so for these the decode below is the
# REAL operation, not a stub. Compressed codecs (JPEG/PNG/MP3/H.264)
# still require libraries absent from this container and remain the
# documented integration point (decode_real marks those rows
# decoded=false with the reason instead of raising, so one bad blob
# cannot kill a 100-TB job).


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary netpbm decode: P6 (RGB) -> (h, w, 3) uint8, P5 (gray) ->
    (h, w) uint8. Header = magic, whitespace/comment-separated width,
    height, maxval (<= 255 supported), one whitespace byte, raw pixels."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary netpbm payload")
    # tokenize the header: whitespace-separated ints, '#' comments to EOL
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raw pixel data
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    ch = 3 if payload[:2] == b"P6" else 1
    pixels = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=pos)
    return pixels.reshape((h, w, 3)) if ch == 3 else pixels.reshape((h, w))


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Inverse of decode_ppm (P6 for 3-channel, P5 for 2-d gray)."""
    if pixels.ndim == 3:
        magic, (h, w) = b"P6", pixels.shape[:2]
    else:
        magic, (h, w) = b"P5", pixels.shape
    return magic + b"\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        pixels, dtype=np.uint8
    ).tobytes()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM decode via the stdlib wave module: (mono float64
    samples in [-1, 1], sample_rate). Multi-channel input is mean-mixed."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        n, width, rate, ch = (
            wf.getnframes(), wf.getsampwidth(), wf.getframerate(), wf.getnchannels()
        )
        raw = wf.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, rate


def _sniff(payload: bytes) -> str:
    if payload[:2] in (b"P6", b"P5"):
        return "netpbm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    return "unknown"


def decode_real(media: DataFrame) -> DataFrame:
    """REAL media decode for uncompressed formats (see module note):
    one row per blob with typed features —

      netpbm image: width/height/channels + per-channel mean and std
      WAV audio:    sample_rate, n_samples, duration_ms, rms, peak,
                    zero-crossing rate

    packed into a fixed `features: array<double>` (image: [w, h, ch,
    mean_r, mean_g, mean_b, std_r, std_g, std_b]; audio: [rate,
    n_samples, duration_ms, rms, peak, zcr, 0, 0, 0]) so the column
    shape is kind-independent. Rows whose payload needs a codec this
    container lacks (jpeg/png/...) come back decoded=false with the
    sniffed format in `error` — per-row isolation, not a job abort.
    Same mapInPandas batch shape as decode_features."""

    def gen(batches):
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"], "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "decoded": [], "format": [], "error": [], "features": [],
            }
            for p in pdf["payload"]:
                b = bytes(p)
                fmt = _sniff(b)
                try:
                    if fmt == "netpbm":
                        px = decode_ppm(b)
                        img = px if px.ndim == 3 else px[:, :, None]
                        mean = img.mean(axis=(0, 1))
                        std = img.std(axis=(0, 1))
                        feats = [
                            float(img.shape[1]), float(img.shape[0]),
                            float(img.shape[2]),
                            *(list(mean) + [0.0] * (3 - img.shape[2])),
                            *(list(std) + [0.0] * (3 - img.shape[2])),
                        ]
                        out["decoded"].append(True)
                        out["error"].append(None)
                    elif fmt == "wav":
                        x, rate = decode_wav(b)
                        n = len(x)
                        rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
                        peak = float(np.abs(x).max()) if n else 0.0
                        zcr = (
                            float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                            if n > 1 else 0.0
                        )
                        feats = [
                            float(rate), float(n), 1000.0 * n / rate,
                            rms, peak, zcr, 0.0, 0.0, 0.0,
                        ]
                        out["decoded"].append(True)
                        out["error"].append(None)
                    else:
                        feats = [0.0] * 9
                        out["decoded"].append(False)
                        out["error"].append(
                            f"codec required for format '{fmt}' — not in container"
                        )
                except Exception as e:  # noqa: BLE001 — per-row isolation:
                    # a malformed RIFF chunk raises wave.Error, truncated
                    # netpbm raises ValueError/EOFError, and any other
                    # codec surprise must mark THIS row failed rather
                    # than kill the whole 100-TB job (ADVICE r05)
                    feats = [0.0] * 9
                    out["decoded"].append(False)
                    out["error"].append(f"{type(e).__name__}: {e}")
                out["format"].append(fmt)
                out["features"].append(feats)
            yield pd.DataFrame(out)

    return media.mapInPandas(
        gen,
        schema=(
            "media_id long, kind string, n_bytes long, decoded boolean, "
            "format string, error string, features array<double>"
        ),
    )


def resize_real(media: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """REAL nearest-neighbor resize for netpbm payloads: decode, index-map
    resample, re-encode. Rows in other formats pass through resize_stub's
    behavior contract (marked resized=false). Same output-per-input-row
    shape as resize_stub so either can back the pipeline."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for mid, w, h, p in zip(
                pdf["media_id"], pdf["width"], pdf["height"], pdf["payload"]
            ):
                b = bytes(p)
                if _sniff(b) != "netpbm":
                    # metadata width/height may be NULL for real ingested
                    # blobs — pass them through instead of raising inside
                    # the UDF (per-row isolation, ADVICE r05)
                    rows.append((
                        int(mid),
                        int(w) if w is not None and w == w else -1,
                        int(h) if h is not None and h == h else -1,
                        target_w, target_h, False, b,
                    ))
                    continue
                try:
                    px = decode_ppm(b)
                    sh, sw = px.shape[:2]
                    yi = (np.arange(target_h) * sh // target_h).astype(np.int64)
                    xi = (np.arange(target_w) * sw // target_w).astype(np.int64)
                    resized = px[yi][:, xi]
                    rows.append((int(mid), sw, sh, target_w, target_h, True,
                                 encode_ppm(resized)))
                except Exception:  # noqa: BLE001 — malformed netpbm row
                    rows.append((
                        int(mid),
                        int(w) if w is not None and w == w else -1,
                        int(h) if h is not None and h == h else -1,
                        target_w, target_h, False, b,
                    ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "src_w", "src_h", "target_w", "target_h",
                         "resized", "payload"],
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        gen,
        schema=(
            "media_id long, src_w int, src_h int, target_w int, target_h int, "
            "resized boolean, payload binary"
        ),
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
