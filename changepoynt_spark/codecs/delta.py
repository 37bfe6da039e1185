"""Delta-of-delta compression for int64 timestamp streams (Pelkonen et al.,
VLDB 2015 §4.1.1), extended so arbitrary int64 sequences round-trip
losslessly: the first two timestamps are stored absolutely, and the escape
code '1111' stores an absolute 64-bit restart (avoids >64-bit deltas when
values span the full int64 range).

Stream layout (pinned by tests/goldens/codec_blobs_frozen.npz):
  - 32-bit count
  - first timestamp:  raw 64 bits (zig-zag)
  - second timestamp: raw 64 bits (zig-zag)
  - per subsequent timestamp, d = delta_i - delta_{i-1} (delta-of-delta):
      '0'                  d == 0
      '10'   + 7  bits     d in [-63, 64]
      '110'  + 9  bits     d in [-255, 256]
      '1110' + 12 bits     d in [-2047, 2048]
      '1111' + 64 bits     absolute zig-zag restart (timestamp itself)

Encode is FULLY vectorized — unlike Gorilla there is no sequential state in
the branch choice (prev_delta is always the true previous delta regardless of
which code was emitted), so bucket selection is elementwise.  True deltas and
delta-of-deltas can exceed int64 (values span the full range); instead of
per-point Python big ints we track the wrap carry of each 64-bit subtraction
explicitly (s, t below), and a small code is emitted iff the total carry is
zero AND the wrapped value is in range — exactly the Python-int semantics.
"""
from __future__ import annotations

import numpy as np

from changepoynt_spark.codecs.bits import BitReader, BitWriter, pack_tokens

_U64 = (1 << 64) - 1
_VECTOR_MIN = 64  # same crossover rationale as codecs/gorilla.py


def _zigzag_scalar(v: int) -> int:
    return ((v << 1) ^ (v >> 63)) & _U64


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _sub_carry(a: np.ndarray, b: np.ndarray):
    """Exact a - b over int64 arrays as (wrapped int64, carry in {-1,0,+1})
    with true value = wrapped + carry * 2**64."""
    w = (a.view(np.uint64) - b.view(np.uint64)).view(np.int64)
    carry = np.zeros(len(w), dtype=np.int64)
    carry[(b < 0) & (a >= 0) & (w < 0)] = 1
    carry[(a < 0) & (b >= 0) & (w >= 0)] = -1
    return w, carry


def _encode_timestamps_small(ts: np.ndarray) -> bytes:
    """Per-point loop encoder (python-int exact deltas) — byte-identical
    stream, faster for tiny blocks."""
    n = ts.shape[0]
    w = BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    w.write(_zigzag_scalar(int(ts[0])), 64)
    if n == 1:
        return w.getvalue()
    w.write(_zigzag_scalar(int(ts[1])), 64)
    prev_delta = int(ts[1]) - int(ts[0])
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
            w.write(_zigzag_scalar(int(ts[i])), 64)
    return w.getvalue()


def encode_timestamps(timestamps: np.ndarray) -> bytes:
    ts = np.ascontiguousarray(np.asarray(timestamps, dtype=np.int64))
    if ts.shape[0] < _VECTOR_MIN:
        return _encode_timestamps_small(ts)
    return _encode_timestamps_vector(ts)


def _encode_timestamps_vector(ts: np.ndarray) -> bytes:
    n = ts.shape[0]
    zz = ((ts << 1) ^ (ts >> 63)).view(np.uint64)   # vectorized zig-zag
    if n == 1:
        return pack_tokens(np.array([n, zz[0]], dtype=np.uint64),
                           np.array([32, 64]))
    if n == 2:
        return pack_tokens(np.array([n, zz[0], zz[1]], dtype=np.uint64),
                           np.array([32, 64, 64]))

    # true delta D_i = dw_i + s_i * 2^64; true dod = ww + coef * 2^64
    dw, s = _sub_carry(ts[1:], ts[:-1])
    ww, t = _sub_carry(dw[1:], dw[:-1])
    coef = t + s[1:] - s[:-1]
    small = coef == 0

    c0 = small & (ww == 0)
    c1 = small & ~c0 & (ww >= -63) & (ww <= 64)
    c2 = small & ~c0 & ~c1 & (ww >= -255) & (ww <= 256)
    c3 = small & ~c0 & ~c1 & ~c2 & (ww >= -2047) & (ww <= 2048)
    c4 = ~(c0 | c1 | c2 | c3)

    u64 = np.uint64
    ctrl_val = np.select([c0, c1, c2, c3, c4],
                         [u64(0), u64(0b10), u64(0b110), u64(0b1110), u64(0b1111)])
    ctrl_bits = np.select([c0, c1, c2, c3, c4], [1, 2, 3, 4, 4])
    # high garbage on unselected branches is masked by pack_tokens (low nbits)
    pay_val = np.select([c1, c2, c3, c4],
                        [(ww + 63).view(u64), (ww + 255).view(u64),
                         (ww + 2047).view(u64), zz[2:]])
    pay_bits = np.select([c1, c2, c3, c4], [7, 9, 12, 64])

    m = n - 2
    vals = np.empty(3 + 2 * m, dtype=np.uint64)
    nbits = np.empty(3 + 2 * m, dtype=np.int64)
    vals[:3] = (n, zz[0], zz[1])
    nbits[:3] = (32, 64, 64)
    vals[3::2] = ctrl_val
    nbits[3::2] = ctrl_bits
    vals[4::2] = pay_val
    nbits[4::2] = pay_bits
    return pack_tokens(vals, nbits)


def decode_timestamps(blob: bytes) -> np.ndarray:
    r = BitReader(blob)
    n = r.read(32)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    read = r.read
    cur = _unzigzag(read(64))
    out[0] = cur
    if n == 1:
        return out
    nxt = _unzigzag(read(64))
    out[1] = nxt
    prev_delta = nxt - cur   # python int: exact even past int64
    cur = nxt
    for i in range(2, n):
        if read(1):
            if read(1) == 0:
                prev_delta += read(7) - 63
            elif read(1) == 0:
                prev_delta += read(9) - 255
            elif read(1) == 0:
                prev_delta += read(12) - 2047
            else:
                new = _unzigzag(read(64))
                prev_delta = new - cur
                cur = new
                out[i] = cur
                continue
        cur += prev_delta
        out[i] = cur
    return out
