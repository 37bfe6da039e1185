"""Gorilla XOR compression for float64 value streams (Pelkonen et al., VLDB
2015 §4.1.2), bit-exact round trip including NaN, +/-0.0, inf and denormals
(values are treated as raw uint64 bit patterns).

Stream layout:
  - 32-bit count
  - first value: raw 64 bits
  - per subsequent value v, x = bits(v) XOR bits(prev):
      '0'                         if x == 0
      '10' + meaningful bits      if leading/trailing zeros fit the previous
                                  window (reuse previous block geometry)
      '11' + 5-bit leading + 6-bit (meaningful-1) + meaningful bits
"""
from __future__ import annotations

import numpy as np

from changepoynt_spark.codecs.bits import BitReader, BitWriter


def _clz64(x: int) -> int:
    return 64 - x.bit_length() if x else 64


def _ctz64(x: int) -> int:
    return (x & -x).bit_length() - 1 if x else 64


def encode_values(values: np.ndarray) -> bytes:
    bits = np.ascontiguousarray(np.asarray(values, dtype=np.float64)).view(np.uint64)
    n = bits.shape[0]
    w = BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    prev = int(bits[0])
    w.write(prev, 64)
    prev_lead, prev_mean = -1, -1  # no stored window yet
    for i in range(1, n):
        cur = int(bits[i])
        x = cur ^ prev
        prev = cur
        if x == 0:
            w.write(0, 1)
            continue
        lead = min(_clz64(x), 31)
        trail = _ctz64(x)
        mean = 64 - lead - trail
        if prev_lead >= 0 and lead >= prev_lead and trail >= 64 - prev_lead - prev_mean:
            # control '10': reuse previous window
            w.write(0b10, 2)
            w.write(x >> (64 - prev_lead - prev_mean), prev_mean)
        else:
            # control '11': new window
            w.write(0b11, 2)
            w.write(lead, 5)
            w.write(mean - 1, 6)
            w.write(x >> trail, mean)
            prev_lead, prev_mean = lead, mean
    return w.getvalue()


def decode_values(blob: bytes) -> np.ndarray:
    r = BitReader(blob)
    n = r.read(32)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    prev = r.read(64)
    out[0] = prev
    lead, mean = 0, 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 0:  # '10' reuse
            x = r.read(mean) << (64 - lead - mean)
        else:               # '11' new window
            lead = r.read(5)
            mean = r.read(6) + 1
            x = r.read(mean) << (64 - lead - mean)
        prev ^= x
        out[i] = prev
    return out.view(np.float64)
