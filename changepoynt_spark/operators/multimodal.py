"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched kernels.

The decode step is STUBBED — image/audio libraries are not available in this
container — behind :func:`_decode_stub`, which either raises
NotImplementedError (real mode) or produces a deterministic fake (test mode).
Everything Spark-side is real and tested: schema, batching, partitioning,
UDF signatures and output shapes are exactly what a production decoder would
plug into.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField('media_id', T.StringType(), False),
    T.StructField('modality', T.StringType(), False),   # image | audio | video
    T.StructField('payload', T.BinaryType(), False),    # opaque encoded bytes
    T.StructField('mime', T.StringType(), True),
    T.StructField('width', T.IntegerType(), True),
    T.StructField('height', T.IntegerType(), True),
    T.StructField('duration_ms', T.IntegerType(), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField('media_id', T.StringType(), False),
    T.StructField('modality', T.StringType(), False),
    T.StructField('n_bytes', T.LongType(), False),
    T.StructField('feature', T.ArrayType(T.FloatType()), True),
])


def _decode_stub(payload: bytes, modality: str, deterministic_fake: bool):
    """Placeholder for a real decoder (PIL/ffmpeg/torchaudio are not in this
    container).  deterministic_fake=True derives a stable pseudo-decode from
    the payload bytes so the downstream plumbing is testable end to end."""
    if not deterministic_fake:
        raise NotImplementedError(
            f'No {modality} decoder available in this environment; install a '
            'decoder and replace _decode_stub.')
    digest = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], 'little'))
    return rng.standard_normal(16).astype(np.float32)


def extract_features(df: DataFrame, feature_dim: int = 16,
                     deterministic_fake: bool = True) -> DataFrame:
    """media table -> per-item feature vectors via mapInPandas (no shuffle;
    binary payloads stream through Arrow in batches)."""

    def kernel(batches):
        for pdf in batches:
            feats = [
                _decode_stub(bytes(p), m, deterministic_fake).tolist()
                for p, m in zip(pdf['payload'], pdf['modality'])]
            yield pd.DataFrame({
                'media_id': pdf['media_id'],
                'modality': pdf['modality'],
                'n_bytes': pdf['payload'].map(len).astype('int64'),
                'feature': feats,
            })

    return df.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts_ms) —
    the explode is native (sequence), only the decode itself would be a
    kernel.  Demonstrates metadata-driven fan-out without touching payloads
    (column pruning keeps the binary column out of this scan entirely)."""
    return (df.filter(F.col('modality') == 'video')
              .select('media_id',
                      F.explode(F.sequence(F.lit(0), F.col('duration_ms'),
                                           F.lit(every_ms))).alias('frame_ts_ms')))


def resize_plan(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Image resize plan: target dimensions that fit ``max_side`` preserving
    aspect ratio (never upscaled), plus the scale factor — pure native
    metadata arithmetic; like frame_sample_plan, the binary payload column
    is pruned from this scan entirely, so planning a 100 TB image corpus
    reads only the (tiny) metadata columns."""
    scale = F.least(F.lit(1.0),
                    F.lit(float(max_side)) / F.greatest('width', 'height'))
    return (df.filter(F.col('modality') == 'image')
              .select('media_id', 'width', 'height',
                      F.round(scale, 6).alias('scale'),
                      F.greatest(F.lit(1), F.ceil(F.col('width') * scale))
                       .cast('int').alias('out_width'),
                      F.greatest(F.lit(1), F.ceil(F.col('height') * scale))
                       .cast('int').alias('out_height')))


def synthetic_media_table(spark, n_items: int = 24, seed: int = 13) -> DataFrame:
    """Deterministic fake media rows (payload = seeded random bytes) for
    tests and the driver's rows-only checks."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_items):
        modality = ('image', 'audio', 'video')[i % 3]
        payload = rng.bytes(64 + int(rng.integers(0, 128)))
        rows.append((f'media_{i:06d}', modality, bytearray(payload),
                     {'image': 'image/png', 'audio': 'audio/wav',
                      'video': 'video/mp4'}[modality],
                     int(rng.integers(16, 512)) if modality != 'audio' else None,
                     int(rng.integers(16, 512)) if modality != 'audio' else None,
                     int(rng.integers(1000, 60000)) if modality != 'image' else None))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
