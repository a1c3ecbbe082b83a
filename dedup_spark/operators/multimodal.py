"""Multimodal asset plumbing: opaque binary columns with typed metadata.

Training-data pipelines carry image/audio/video next to text. The Spark
treatment: assets are rows of an ``assets`` table with an opaque
``payload: binary`` column plus a typed metadata struct; decode /
feature-extraction / resize / frame-sampling run as Arrow-batched
``mapInPandas`` passes so payloads never round-trip through per-row
Python.

This container has no image/audio codecs (no PIL / librosa / ffmpeg),
so the DECODE step is stubbed two ways:

* :func:`decode_asset_batch` raises ``NotImplementedError`` unless a
  real decoder import succeeds — the integration point for production;
* :func:`fake_decode` is a deterministic stand-in (seeded from the
  payload bytes) with the real batch shape, so the Spark-side plumbing
  — schema, partitioning, UDF signature, Arrow batch handling — is
  fully exercised and tested.

Schema:

    assets(asset_id: long, conv_id: string, kind: string,
           payload: binary,
           meta: struct<width:int, height:int, sample_rate:int,
                        duration_ms:int>)
    features(asset_id: long, kind: string, dim: int,
             features: array<float>)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

ASSET_SCHEMA = (
    "asset_id long, conv_id string, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>"
)

FEATURE_SCHEMA = "asset_id long, kind string, dim int, features array<float>"

FEATURE_DIM = 64


def synthesize_assets(documents: DataFrame) -> DataFrame:
    """Derive a deterministic assets table from ``documents`` — payload
    bytes are the utf-8 text (an opaque blob as far as this module is
    concerned), alternating image/audio kinds with plausible metadata.
    Purely for exercising the plumbing; production reads a real table."""
    kind = F.when(F.col("doc_id") % 2 == 0, "image").otherwise("audio")
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.col("doc_id").cast("string").alias("conv_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.when(F.col("doc_id") % 2 == 0, (F.col("doc_id") % 640 + 32).cast("int")).alias("width"),
            F.when(F.col("doc_id") % 2 == 0, (F.col("doc_id") % 480 + 32).cast("int")).alias("height"),
            F.when(F.col("doc_id") % 2 == 1, F.lit(16000)).cast("int").alias("sample_rate"),
            F.when(F.col("doc_id") % 2 == 1, (F.length("text") * 10).cast("int")).alias("duration_ms"),
        ).alias("meta"),
    )


def _real_decoder_available() -> bool:
    try:  # pragma: no cover - codecs absent in this environment
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_asset_batch(payloads: pd.Series, kinds: pd.Series) -> np.ndarray:
    """Decode a batch of payloads → (n, FEATURE_DIM) float32 features.

    Integration point for real codecs (PIL for images, soundfile/librosa
    for audio). STUB: raises in this environment — use
    :func:`fake_decode` in tests and local runs."""
    if not _real_decoder_available():
        raise NotImplementedError(
            "no image/audio codecs in this environment; "
            "use fake_decode for the plumbing path"
        )
    raise NotImplementedError("real decoder wiring is environment-specific")


def fake_decode(payloads: pd.Series, kinds: pd.Series) -> np.ndarray:
    """Deterministic decode stand-in with the real batch shape:
    (n, FEATURE_DIM) float32 derived from payload bytes — stable across
    runs, partitions, and batch splits.

    Lane value = (integer lane byte-sum mod 256) / 256: every value is
    an exact float32 (k/256), so downstream aggregations are
    bit-reproducible in any engine — which is what lets the driver's
    DuckDB oracle mirror this "decode" exactly (list ops over text
    bytes) instead of a rows-only check."""
    out = np.zeros((len(payloads), FEATURE_DIM), dtype=np.float32)
    for i, (blob, kind) in enumerate(zip(payloads, kinds)):
        b = np.frombuffer(bytes(blob or b""), dtype=np.uint8)
        if b.size == 0:
            continue
        # fold bytes into FEATURE_DIM lanes (vectorized; no codecs)
        pad = (-b.size) % FEATURE_DIM
        lanes = np.pad(b, (0, pad)).reshape(-1, FEATURE_DIM)
        sums = lanes.sum(axis=0, dtype=np.int64)
        out[i] = (sums % 256).astype(np.float32) / 256.0
        if kind == "audio":
            out[i] = np.roll(out[i], 1)  # kind-distinct, still deterministic
    return out


def extract_features(assets: DataFrame, use_fake: bool = True) -> DataFrame:
    """assets → features via mapInPandas (Arrow batches end to end)."""
    decode = fake_decode if use_fake else decode_asset_batch

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = decode(pdf["payload"], pdf["kind"])
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "dim": np.full(len(pdf), FEATURE_DIM, dtype=np.int32),
                    "features": list(feats),
                }
            )

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def resize_meta(assets: DataFrame, max_side: int = 256) -> DataFrame:
    """Pure-metadata resize plan (the actual pixel work happens inside
    the decode pass): compute target dims preserving aspect ratio —
    JVM-side arithmetic, no UDF."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.when(
        (w > max_side) | (h > max_side),
        F.least(F.lit(max_side) / w, F.lit(max_side) / h),
    ).otherwise(F.lit(1.0))
    return assets.withColumn(
        "resize_to",
        F.when(
            F.col("kind") == "image",
            F.struct(
                F.floor(w * scale).cast("int").alias("width"),
                F.floor(h * scale).cast("int").alias("height"),
            ),
        ),
    )


def sample_frames(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for timed media: one row per sampled offset
    (explode of a JVM-computed sequence — the same fused generate+project
    shape as the suffix-key explode, no arrays materialized)."""
    dur = F.col("meta.duration_ms")
    timed = assets.filter(dur.isNotNull() & (dur > 0))
    return (
        timed.select(
            "asset_id",
            "kind",
            F.explode(
                F.sequence(F.lit(0), dur - 1, F.lit(every_ms))
            ).alias("offset_ms"),
        )
    )
