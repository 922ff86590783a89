"""Multimodal columns: images/audio/video as opaque binary + typed
metadata, processed by Arrow-batched `mapInPandas` operators.

Decode support comes in two tiers:
- ``fake=False`` (round 4): REAL pure-Python decode for uncompressed
  container formats — 24-bit BMP, binary PPM/PGM, 16-bit PCM WAV —
  via datapipe/media_codecs.py (zero library dependencies, the
  MMDB/OTLP precedent).  Payloads in formats that genuinely need a
  codec library (JPEG/PNG/MP3/video) come back ``ok=false`` with a
  NULL feature — the error-channel convention; on a real cluster,
  PIL/soundfile extend media_codecs.sniff_and_featurize without
  touching the plan.
- ``fake=True``: the deterministic byte-hash stand-in (stable feature
  values for any payload) — useful for plumbing tests and synthetic
  blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

#: canonical multimodal schema: opaque payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, feat array<float>, ok boolean"
)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table: payload = repeated bytes
    derived from the id (a stand-in for real image/audio blobs)."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(
            F.concat(F.lit("BLOB:"), F.lpad(F.col("id").cast("string"), 8, "0"),
                     F.repeat(F.lit("x"), (F.col("id") % 50 + 10).cast("int"))),
            "UTF-8",
        ).alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        ((F.col("id") % 16 + 1) * 32).cast("int").alias("width"),
        ((F.col("id") % 9 + 1) * 32).cast("int").alias("height"),
        (F.col("id") * 40 + 1000).alias("duration_ms"),
    )


def _fake_decode(payload: bytes, dim: int) -> list[float]:
    """Deterministic fake feature vector from payload bytes."""
    acc = 2166136261
    out = []
    for i in range(dim):
        for b in payload[i :: dim] or b"\x00":
            acc = (acc ^ b) * 16777619 % (1 << 32)
        out.append((acc % 10_000) / 10_000.0)
    return out


def extract_features(
    df: DataFrame, *, dim: int = 8, fake: bool = True
) -> DataFrame:
    """Decode + featurize media payloads via mapInPandas.

    Real decoders (PIL/librosa/ffmpeg) are not available in this
    container — ``fake=False`` raises NotImplementedError at executor
    time, documenting exactly where the real kernel plugs in.  Batches
    arrive as Arrow-backed pandas frames; one python worker per
    partition, no per-row IPC.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from vector_spark.datapipe.media_codecs import sniff_and_featurize

        for pdf in batches:
            feats: list[list[float] | None] = []
            oks: list[bool] = []
            for p in pdf["payload"]:
                if p is None:
                    feats.append(None)
                    oks.append(False)
                    continue
                if fake:
                    feats.append(_fake_decode(bytes(p), dim))
                    oks.append(True)
                    continue
                try:
                    f = sniff_and_featurize(bytes(p), dim)
                except ValueError:
                    f = None  # recognized magic, malformed body
                feats.append(f)
                oks.append(f is not None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) if p is not None else 0 for p in pdf["payload"]],
                    "feat": feats,
                    "ok": oks,
                }
            )

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def resize_plan(
    df: DataFrame, target_w: int, target_h: int, *, fake: bool = True
) -> DataFrame:
    """Image resize: the metadata math (aspect-preserving fit into
    target_w×target_h) is pure Column arithmetic; the pixel kernel is
    the same stubbed mapInPandas seam as extract_features — a real
    PIL/opencv resize drops into `op` without touching the plan."""
    imgs = df.filter(F.col("kind") == "image")
    scale = F.least(
        F.lit(target_w) / F.col("width"), F.lit(target_h) / F.col("height")
    )
    planned = imgs.withColumn("scale", scale).withColumn(
        "out_w", F.ceil(F.col("width") * F.col("scale")).cast("int")
    ).withColumn(
        "out_h", F.ceil(F.col("height") * F.col("scale")).cast("int")
    )

    out_schema = (
        "media_id long, out_w int, out_h int, payload binary, ok boolean"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from vector_spark.datapipe.media_codecs import (
            decode_bmp, decode_ppm, encode_bmp, encode_ppm, resize_nearest,
        )

        for pdf in batches:
            outs: list[bytes | None] = []
            oks: list[bool] = []
            for p, ow, oh in zip(
                pdf["payload"], pdf["out_w"], pdf["out_h"]
            ):
                if p is None:
                    outs.append(None)
                    oks.append(False)
                    continue
                if fake:
                    outs.append(p)  # stub: bytes pass through
                    oks.append(True)
                    continue
                b = bytes(p)
                try:
                    if b[:2] == b"BM":
                        out = encode_bmp(
                            resize_nearest(decode_bmp(b), int(ow), int(oh))
                        )
                    elif b[:1] == b"P" and b[1:2] in (b"5", b"6"):
                        out = encode_ppm(
                            resize_nearest(decode_ppm(b), int(ow), int(oh))
                        )
                    else:
                        out = None  # JPEG/PNG: needs a codec library
                except ValueError:
                    out = None
                outs.append(out)
                oks.append(out is not None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_w": pdf["out_w"],
                    "out_h": pdf["out_h"],
                    "payload": outs,
                    "ok": oks,
                }
            )

    return planned.mapInPandas(op, schema=out_schema)


def audio_chunk_plan(
    df: DataFrame, chunk_ms: int = 5000, overlap_ms: int = 0
) -> DataFrame:
    """Audio chunking: one row per (chunk_start, chunk_end) window with
    optional overlap — sequence + explode, pure Spark; the sample-level
    slice is the stubbed decode kernel's job."""
    stride = chunk_ms - overlap_ms
    if stride <= 0:
        raise ValueError("overlap_ms must be smaller than chunk_ms")
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(stride)
    )
    return (
        df.filter(F.col("kind") == "audio")
        .withColumn("chunk_start_ms", F.explode(starts))
        .withColumn(
            "chunk_end_ms",
            F.least(F.col("chunk_start_ms") + chunk_ms, F.col("duration_ms")),
        )
        .select("media_id", "chunk_start_ms", "chunk_end_ms", "payload")
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one output row per sampled frame
    timestamp (sequence + explode — pure Spark; the actual frame decode
    is the stubbed kernel above)."""
    frames = F.sequence(
        F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms)
    )
    return (
        df.filter(F.col("kind") == "video")
        .withColumn("frame_ts_ms", F.explode(frames))
        .select("media_id", "frame_ts_ms", "payload")
    )
