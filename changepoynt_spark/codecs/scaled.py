"""Scaled-integer value codec: decimal-quantized gauges as int64
delta-of-delta.

Gorilla XOR is the right codec for FULL-precision doubles, but most gauge
telemetry is decimal-quantized at the source (a 1-decimal temperature, a
2-decimal price) — and a quantized double still carries a full random
mantissa in binary, so XOR compression saturates near 1x (measured in
BENCH/COMPRESSION.md).  Representing those values EXACTLY as
``round(v * 10^d)`` int64 and reusing the delta-of-delta codec turns slow-
moving gauges into ~1 byte/point streams.

``encode_values_scaled`` is safe-by-construction: it FIRST verifies the
scaled representation round-trips bit-exactly (every value equals
``scaled / 10^d`` as a double); if any value doesn't, it falls back to the
Gorilla blob.  A 1-byte header tags the path, so decode is self-describing
and the composite codec is lossless on ANY input.
"""
from __future__ import annotations

import numpy as np

from changepoynt_spark.codecs.delta import decode_timestamps, encode_timestamps
from changepoynt_spark.codecs.gorilla import decode_values, encode_values

_TAG_SCALED = 0x53      # 'S'
_TAG_GORILLA = 0x47     # 'G'
_I64 = np.iinfo(np.int64)


def encode_values_scaled(values: np.ndarray, decimals: int = 6) -> bytes:
    """Encode float64 values, preferring the scaled-int64 delta-of-delta
    path when ``round(v * 10^decimals) / 10^decimals`` reproduces every
    value bit-for-bit (NaN/inf/out-of-range fall back to Gorilla)."""
    v = np.ascontiguousarray(values, dtype=np.float64)
    scale = float(10 ** decimals)
    with np.errstate(invalid='ignore', over='ignore'):
        scaled = np.round(v * scale)
        ok = (np.isfinite(v)
              & (np.abs(scaled) < _I64.max / 2)
              & (scaled.astype(np.int64, copy=False).astype(np.float64) == scaled))
        if bool(ok.all()):
            ints = scaled.astype(np.int64)
            exact = (ints.astype(np.float64) / scale)
            if np.array_equal(exact.view(np.int64), v.view(np.int64)):
                return bytes([_TAG_SCALED, decimals]) + encode_timestamps(ints)
    return bytes([_TAG_GORILLA, 0]) + encode_values(v)


def decode_values_scaled(blob: bytes) -> np.ndarray:
    tag, decimals = blob[0], blob[1]
    body = blob[2:]
    if tag == _TAG_SCALED:
        ints = decode_timestamps(body)
        return ints.astype(np.float64) / float(10 ** decimals)
    if tag == _TAG_GORILLA:
        return decode_values(body)
    raise ValueError(f'unknown scaled-codec tag {tag:#x}')
