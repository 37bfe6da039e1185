"""Block-Hankel operators for multivariate series (numpy oracle).

Re-derives the semantics of the reference's block Hankel representation
(/root/reference/changepoynt/utils/block_linalg.py:371-822): blocks
B[k] = ts[k, :] (one channel vector per sample, shape (C, 1)) and
H[i, j] = B[i + j], i.e. a dense matrix of shape (window_length * C,
n_windows) whose column j stacks the channel vectors of samples
start+j .. start+j+w-1.

Two forms, used by MSST/MESST:
- :func:`compile_block_hankel` — dense, fully vectorized (strided view);
- :class:`BlockFastHankel` — implicit: one rFFT Hankel per channel; block
  products are interleaved per-channel FFT correlations, O(C * L log L) per
  column (the multivariate analogue of linalg.FastHankel; replaces the
  reference's einsum/FFT block machinery with a per-channel decomposition
  that computes identical products).
"""
from __future__ import annotations

import numpy as np

from changepoynt_spark.kernels.linalg import FastHankel, _Transposed


def compile_block_hankel(time_series: np.ndarray, end_index: int, window_size: int,
                         rank: int) -> np.ndarray:
    """Dense block Hankel (window_size * C, rank) from a (T, C) series."""
    assert time_series.ndim == 2, 'Block Hankel input must be 2-D (samples, channels).'
    w, n = int(window_size), int(rank)
    sl = time_series[end_index - w - n + 1:end_index, :]
    view = np.lib.stride_tricks.sliding_window_view(sl, w, axis=0)  # (n, C, w)
    c = sl.shape[1]
    return view.transpose(2, 1, 0).reshape(w * c, n).astype(np.float64, copy=True)


def batched_block_hankels(time_series: np.ndarray, ends: np.ndarray, window_size: int,
                          rank: int) -> np.ndarray:
    """(B, w*C, n) stack of dense block Hankels ending at each index in
    ``ends`` — the multivariate analogue of sst._batched_hankels (one
    strided gather per channel, rows interleaved sample-major)."""
    assert time_series.ndim == 2
    w, n = int(window_size), int(rank)
    c = time_series.shape[1]
    per_channel = []
    for ch in range(c):
        view = np.lib.stride_tricks.sliding_window_view(
            np.ascontiguousarray(time_series[:, ch]), n)
        starts = ends - w - n + 1
        per_channel.append(view[starts[:, None] + np.arange(w)[None, :]])  # (B, w, n)
    stacked = np.stack(per_channel, axis=2)  # (B, w, C, n)
    b = ends.shape[0]
    return stacked.reshape(b, w * c, n)


class BlockFastHankel:
    """Implicit block Hankel: per-channel FFT Hankels with interleaved rows."""

    __slots__ = ('channels', 'w', 'n', 'c')

    def __init__(self, time_series: np.ndarray, end_index: int, window_size: int, rank: int):
        assert time_series.ndim == 2
        self.w = int(window_size)
        self.n = int(rank)
        self.c = time_series.shape[1]
        self.channels = [FastHankel(np.ascontiguousarray(time_series[:, ch]),
                                    end_index, self.w, self.n)
                         for ch in range(self.c)]

    @property
    def shape(self):
        return (self.w * self.c, self.n)

    def matmat(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        if x.ndim == 1:
            x = x[:, None]
        outs = np.stack([h.matmat(x) for h in self.channels], axis=1)  # (w, C, k)
        return outs.reshape(self.w * self.c, x.shape[1])

    def t_matmat(self, y: np.ndarray) -> np.ndarray:
        y = np.asarray(y, dtype=np.float64)
        if y.ndim == 1:
            y = y[:, None]
        yr = y.reshape(self.w, self.c, y.shape[1])
        out = self.channels[0].t_matmat(np.ascontiguousarray(yr[:, 0, :]))
        for ch in range(1, self.c):
            out = out + self.channels[ch].t_matmat(np.ascontiguousarray(yr[:, ch, :]))
        return out

    def __matmul__(self, other):
        from changepoynt_spark.kernels.linalg import LazyGram
        if isinstance(other, _Transposed) and other.base is self:
            return LazyGram(self)
        return self.matmat(other)

    @property
    def T(self):
        return _Transposed(self)

    def dense(self) -> np.ndarray:
        eye = np.eye(self.n)
        return self.matmat(eye)
