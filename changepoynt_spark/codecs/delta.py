"""Delta-of-delta compression for int64 timestamp streams (Pelkonen et al.,
VLDB 2015 §4.1.1), extended so arbitrary int64 sequences round-trip
losslessly: the first two timestamps are stored absolutely, and the escape
code '1111' stores an absolute 64-bit restart (avoids >64-bit deltas when
values span the full int64 range).

Stream layout:
  - 32-bit count
  - first timestamp:  raw 64 bits (zig-zag)
  - second timestamp: raw 64 bits (zig-zag)
  - per subsequent timestamp, d = delta_i - delta_{i-1} (delta-of-delta):
      '0'                  d == 0
      '10'   + 7  bits     d in [-63, 64]
      '110'  + 9  bits     d in [-255, 256]
      '1110' + 12 bits     d in [-2047, 2048]
      '1111' + 64 bits     absolute zig-zag restart (timestamp itself)
"""
from __future__ import annotations

import numpy as np

from changepoynt_spark.codecs.bits import BitReader, BitWriter

_U64 = (1 << 64) - 1


def _zigzag(v: int) -> int:
    return ((v << 1) ^ (v >> 63)) & _U64


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def encode_timestamps(timestamps: np.ndarray) -> bytes:
    ts = np.asarray(timestamps, dtype=np.int64)
    n = ts.shape[0]
    w = BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    w.write(_zigzag(int(ts[0])), 64)
    if n == 1:
        return w.getvalue()
    w.write(_zigzag(int(ts[1])), 64)
    prev_delta = int(ts[1]) - int(ts[0])  # python int: no overflow
    for i in range(2, n):
        delta = int(ts[i]) - int(ts[i - 1])
        d = delta - prev_delta
        prev_delta = delta
        if d == 0:
            w.write(0, 1)
        elif -63 <= d <= 64:
            w.write(0b10, 2)
            w.write(d + 63, 7)
        elif -255 <= d <= 256:
            w.write(0b110, 3)
            w.write(d + 255, 9)
        elif -2047 <= d <= 2048:
            w.write(0b1110, 4)
            w.write(d + 2047, 12)
        else:
            w.write(0b1111, 4)
            w.write(_zigzag(int(ts[i])), 64)
    return w.getvalue()


def decode_timestamps(blob: bytes) -> np.ndarray:
    r = BitReader(blob)
    n = r.read(32)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    cur = _unzigzag(r.read(64))
    out[0] = cur
    if n == 1:
        return out
    nxt = _unzigzag(r.read(64))
    out[1] = nxt
    prev_delta = nxt - cur
    cur = nxt
    for i in range(2, n):
        b = r.read(1)
        if b == 0:
            cur += prev_delta
        else:
            b = r.read(1)
            if b == 0:
                prev_delta += r.read(7) - 63
                cur += prev_delta
            else:
                b = r.read(1)
                if b == 0:
                    prev_delta += r.read(9) - 255
                    cur += prev_delta
                else:
                    b = r.read(1)
                    if b == 0:
                        prev_delta += r.read(12) - 2047
                        cur += prev_delta
                    else:
                        new = _unzigzag(r.read(64))
                        prev_delta = new - cur
                        cur = new
        out[i] = cur
    return out
