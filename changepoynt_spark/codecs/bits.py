"""Minimal MSB-first bit reader/writer over bytes, used by the Gorilla and
delta-of-delta codecs.  Sequential by nature (variable-length codes); fast
enough for rolled-up block sizes (the engine compresses tier aggregates, not
raw points, so blocks are small)."""
from __future__ import annotations


class BitWriter:
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
    __slots__ = ('_data', '_pos')

    def __init__(self, data: bytes):
        self._data = data
        self._pos = 0  # bit position

    def read(self, nbits: int) -> int:
        out = 0
        pos = self._pos
        data = self._data
        for _ in range(nbits):
            byte = data[pos >> 3]
            out = (out << 1) | ((byte >> (7 - (pos & 7))) & 1)
            pos += 1
        self._pos = pos
        return out
