"""Gorilla XOR compression for float64 value streams (Pelkonen et al., VLDB
2015 §4.1.2), bit-exact round trip including NaN, +/-0.0, inf and denormals
(values are treated as raw uint64 bit patterns).

Stream layout (pinned by tests/goldens/codec_blobs_frozen.npz):
  - 32-bit count
  - first value: raw 64 bits
  - per subsequent value v, x = bits(v) XOR bits(prev):
      '0'                         if x == 0
      '10' + meaningful bits      if leading/trailing zeros fit the previous
                                  window (reuse previous block geometry)
      '11' + 5-bit leading + 6-bit (meaningful-1) + meaningful bits

Encode is vectorized: XOR deltas, leading/trailing-zero classes and all bit
fields come from whole-array numpy (codecs/bits.py clz64/ctz64/pack_tokens);
the only Python loop left is the window-reuse scan — a genuinely sequential
state machine (the active window depends on which earlier points re-windowed),
but it is 4 integer compares per NONZERO delta over pre-extracted lists, not
big-int bit accumulation per point.  Decode is sequential by nature
(variable-length codes); it parses XOR deltas with the word-at-a-time
BitReader and reconstructs values with one np.bitwise_xor.accumulate.
"""
from __future__ import annotations

import numpy as np

from changepoynt_spark.codecs.bits import BitReader, BitWriter, clz64, ctz64, pack_tokens

# Below this the per-call overhead of the whole-array passes exceeds the
# loop's per-point cost (measured crossover ~48 points on this host; the
# loop is ~4x faster at n=8, the vectorized path ~6x faster at n=512+).
# Rolled-tier blocks are often tiny (a doc-day of 1h/1d buckets is 1-24
# points), so the small path matters in the fused pipeline.
_VECTOR_MIN = 64


def _clz64_int(x: int) -> int:
    return 64 - x.bit_length() if x else 64


def _ctz64_int(x: int) -> int:
    return (x & -x).bit_length() - 1 if x else 64


def _encode_values_small(bits: np.ndarray) -> bytes:
    """Per-point loop encoder — byte-identical stream, faster for tiny
    blocks (no whole-array pass overhead)."""
    n = bits.shape[0]
    w = BitWriter()
    w.write(n, 32)
    prev = int(bits[0])
    w.write(prev, 64)
    prev_lead, prev_mean = -1, -1
    for i in range(1, n):
        cur = int(bits[i])
        x = cur ^ prev
        prev = cur
        if x == 0:
            w.write(0, 1)
            continue
        lead = min(_clz64_int(x), 31)
        trail = _ctz64_int(x)
        mean = 64 - lead - trail
        if prev_lead >= 0 and lead >= prev_lead and trail >= 64 - prev_lead - prev_mean:
            w.write(0b10, 2)
            w.write(x >> (64 - prev_lead - prev_mean), prev_mean)
        else:
            w.write(0b11, 2)
            w.write(lead, 5)
            w.write(mean - 1, 6)
            w.write(x >> trail, mean)
            prev_lead, prev_mean = lead, mean
    return w.getvalue()


def encode_values(values: np.ndarray) -> bytes:
    bits = np.ascontiguousarray(np.asarray(values, dtype=np.float64)).view(np.uint64)
    n = bits.shape[0]
    if n == 0:
        return pack_tokens(np.array([0], dtype=np.uint64), np.array([32]))
    if n < _VECTOR_MIN:
        return _encode_values_small(bits)
    return _encode_values_vector(bits)


def _encode_values_vector(bits: np.ndarray) -> bytes:
    n = bits.shape[0]
    x = bits[1:] ^ bits[:-1]
    nz = np.flatnonzero(x)
    x_nz = x[nz]
    lead = np.minimum(clz64(x_nz), 31)
    trail = ctz64(x_nz)
    mean = 64 - lead - trail

    # Sequential window-reuse scan: win[j] = index (into nz) of the '11'
    # store whose window governs entry j; an entry stores iff win[j] == j.
    # Plain-int compares over pre-extracted lists + one list append per entry;
    # everything else in this function is whole-array numpy.
    k = len(nz)
    wins = []
    app = wins.append
    cur = 0
    cur_l, cur_t = 32, 65  # sentinel: nothing fits -> first entry stores
    for j, l, t in zip(range(k), lead.tolist(), trail.tolist()):
        if l >= cur_l and t >= cur_t:
            app(cur)
        else:
            cur = j
            cur_l = l
            cur_t = t
            app(j)
    win = np.fromiter(wins, np.int64, k)
    store = win == np.arange(k, dtype=np.int64)

    # Window geometry per entry; for stores win[j] == j so Tw/Mw are its own.
    t_w = trail[win].astype(np.uint64)
    m_w = mean[win]
    # '11' control packs lead(5) + mean-1(6) with the 2 control bits -> 13-bit
    # token; '10' is the bare 2-bit token.  Payload = meaningful bits.
    ctrl_val = np.where(store,
                        (np.uint64(0b11) << np.uint64(11))
                        | (lead.astype(np.uint64) << np.uint64(6))
                        | (mean - 1).astype(np.uint64),
                        np.uint64(0b10))
    ctrl_bits = np.where(store, 13, 2)
    pay_val = x_nz >> t_w
    pay_bits = m_w

    # Interleave into the full token stream: header, first value, then per
    # point a control token (default '0',1 bit) and an optional payload.
    m = n - 1
    vals = np.zeros(2 + 2 * m, dtype=np.uint64)
    nbits = np.zeros(2 + 2 * m, dtype=np.int64)
    vals[0], nbits[0] = n, 32
    vals[1], nbits[1] = bits[0], 64
    if k == m:      # dense case (real-valued data): strided slices, no gather
        vals[2::2] = ctrl_val
        nbits[2::2] = ctrl_bits
        vals[3::2] = pay_val
        nbits[3::2] = pay_bits
    else:
        nbits[2::2] = 1                  # '0' control for zero deltas
        ci = 2 + 2 * nz
        vals[ci] = ctrl_val
        nbits[ci] = ctrl_bits
        vals[ci + 1] = pay_val
        nbits[ci + 1] = pay_bits
    return pack_tokens(vals, nbits)


def decode_values(blob: bytes) -> np.ndarray:
    r = BitReader(blob)
    n = r.read(32)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    xors = np.empty(n, dtype=np.uint64)
    xors[0] = r.read(64)
    read = r.read
    lead, mean = 0, 0
    shift = 64
    for i in range(1, n):
        if read(1) == 0:
            xors[i] = 0
            continue
        if read(1):                # '11' new window
            lead = read(5)
            mean = read(6) + 1
            shift = 64 - lead - mean
        xors[i] = read(mean) << shift
    return np.bitwise_xor.accumulate(xors).view(np.float64)
