"""Bit-stream helpers for the Gorilla and delta-of-delta codecs.

Encode side is fully vectorized: :func:`pack_tokens` concatenates variable-
width MSB-first bit fields with numpy index expansion + ``np.packbits`` — no
per-bit (or even per-token) Python loop.  Decode is inherently sequential
(variable-length codes whose lengths depend on decoded content), so
:class:`BitReader` reads word-at-a-time from a pre-split list of 64-bit
big-endian words: one or two Python int ops per field instead of one loop
iteration per BIT.

The stream format (MSB-first, zero-padded final byte) is pinned by
tests/goldens/codec_blobs_frozen.npz — blobs must stay byte-identical across
engine versions so stored blocks remain readable.
"""
from __future__ import annotations

import numpy as np

def pack_tokens(vals: np.ndarray, nbits: np.ndarray) -> bytes:
    """Concatenate ``len(vals)`` bit fields, field i being the low
    ``nbits[i]`` bits of ``vals[i]`` written MSB-first; final byte is
    zero-padded.  ``nbits[i]`` must be in [0, 64]; 0-width fields are
    skipped (handy for mask-built token streams).

    Vectorized O(tokens), not O(bits): a <=64-bit field at any bit offset
    spans at most TWO 64-bit output words, so each token contributes one
    shifted value to word[start>>6] and (if it straddles) one to the next
    word, scattered with np.bitwise_or.at (duplicate indices combine
    correctly because OR is the scatter op).
    """
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    nbits = np.ascontiguousarray(nbits, dtype=np.int64)
    ends = np.cumsum(nbits)
    total = int(ends[-1]) if len(ends) else 0
    if total == 0:
        return b''
    starts = ends - nbits
    # drop zero-width fields: they carry no bits, and a trailing one would
    # compute a word index one past the end of the output
    keep = nbits > 0
    if not keep.all():
        vals = vals[keep]
        nbits = nbits[keep]
        starts = starts[keep]
    # mask to the low nbits (x86 masks shift counts to 6 bits, so 1<<64 is
    # bogus — select the full mask explicitly for 64-bit fields)
    full = np.uint64(0xFFFFFFFFFFFFFFFF)
    mask = np.where(nbits >= 64, full,
                    (np.uint64(1) << nbits.astype(np.uint64)) - np.uint64(1))
    v = vals & mask

    words = np.zeros((total + 63) >> 6, dtype=np.uint64)
    wi = starts >> 6
    off = (starts & 63).astype(np.int64)
    avail = 64 - off
    fits = nbits <= avail
    lsh = np.where(fits, avail - nbits, 0).astype(np.uint64)
    rsh = np.where(fits, 0, nbits - avail).astype(np.uint64)
    hi = np.where(fits, v << lsh, v >> rsh)
    np.bitwise_or.at(words, wi, hi)
    spill = ~fits
    if spill.any():
        # rsh in [1, 63] here, so 64 - rsh is a valid shift
        lo = v[spill] << (np.uint64(64) - rsh[spill])
        np.bitwise_or.at(words, wi[spill] + 1, lo)
    return words.astype('>u8').tobytes()[:(total + 7) >> 3]


# ---------------------------------------------------------------------------
# vectorized bit-length / clz / ctz over uint64 arrays
# ---------------------------------------------------------------------------

def _bit_length_u32(a: np.ndarray) -> np.ndarray:
    """bit_length of each element; elements must be < 2**32 (stored in any
    uint dtype).  uint32 -> float64 conversion is exact, and frexp's exponent
    IS the bit length (0.5 <= m < 1, v = m * 2**e), so this is exact — no
    log2 rounding hazards."""
    _, e = np.frexp(a.astype(np.float64))
    return e.astype(np.int64)  # a == 0 -> 0


def bit_length_u64(x: np.ndarray) -> np.ndarray:
    hi = x >> np.uint64(32)
    lo = x & np.uint64(0xFFFFFFFF)
    return np.where(hi > 0, _bit_length_u32(hi) + 64 - 32, _bit_length_u32(lo))


def clz64(x: np.ndarray) -> np.ndarray:
    """Leading-zero count per element (64 for x == 0)."""
    return 64 - bit_length_u64(x)


def ctz64(x: np.ndarray) -> np.ndarray:
    """Trailing-zero count per element (64 for x == 0)."""
    lsb = x & (~x + np.uint64(1))          # isolate lowest set bit (mod 2^64)
    # lsb is a power of two (or 0) -> float64 conversion is EXACT even above
    # 2^53, so one frexp covers the full 64-bit range (no hi/lo split)
    _, e = np.frexp(lsb.astype(np.float64))
    return np.where(x == 0, np.int64(64), e.astype(np.int64) - 1)


# ---------------------------------------------------------------------------
# sequential readers / writers (decode side, and tiny-input encode fallback)
# ---------------------------------------------------------------------------

class BitWriter:
    """Kept for API symmetry and format documentation; the codecs' encode
    paths use :func:`pack_tokens` instead."""
    __slots__ = ('_buf', '_acc', '_nbits')

    def __init__(self):
        self._buf = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        """Write the low ``nbits`` of ``value``, MSB first."""
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self._buf.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def getvalue(self) -> bytes:
        if self._nbits:
            pad = 8 - self._nbits
            return bytes(self._buf) + bytes([(self._acc << pad) & 0xFF])
        return bytes(self._buf)


class BitReader:
    """Word-at-a-time MSB-first reader: the blob is split once into 64-bit
    big-endian words (a Python list, so indexing is a single op), and each
    read(nbits<=64) touches at most two words."""
    __slots__ = ('_words', '_pos')

    def __init__(self, data: bytes):
        data = bytes(data)
        pad = (-len(data)) % 8
        if pad:
            data = data + b'\x00' * pad
        self._words = np.frombuffer(data, dtype='>u8').tolist()
        self._pos = 0  # bit position

    def read(self, nbits: int) -> int:
        """Read ``nbits`` (<= 64) MSB-first."""
        pos = self._pos
        self._pos = pos + nbits
        off = pos & 63
        avail = 64 - off
        w = self._words[pos >> 6]
        if nbits <= avail:
            return (w >> (avail - nbits)) & ((1 << nbits) - 1)
        rem = nbits - avail
        return ((w & ((1 << avail) - 1)) << rem) | (self._words[(pos >> 6) + 1] >> (64 - rem))
