"""FLUSS semantic segmentation via an own z-normalized matrix profile
(numpy oracle).

Re-derives the semantics of the reference FLUSS wrapper
(/root/reference/changepoynt/algorithms/fluss.py:6-52; Gharghabi et al., ICDM
2017 "Matrix Profile VIII") without stumpy (absent here):

- matrix profile: STOMP recursion (Zhu et al. 2016) with z-normalized
  Euclidean distance and an exclusion zone of ceil(m/4) around the trivial
  match (stumpy's default),
- corrected arc curve: arc crossing counts normalized by the idealized
  parabola 2*i*(k-i)/k, capped at 1, with a 5*L exclusion region pinned to
  1.0 at both ends (stumpy.fluss semantics with n_regimes=1),
- returned score is ``1 - cac`` with length ``len(ts) - m + 1``.

Fully deterministic; this module defines the engine's FLUSS goldens.
NOTE for the engine: the profile is O(T^2) time / O(T) memory — the Spark
layer chunks very long series before dispatching this kernel.
"""
from __future__ import annotations

import numpy as np

from changepoynt_spark.kernels.base import Algorithm


def matrix_profile_index(time_series: np.ndarray, m: int) -> np.ndarray:
    """Nearest-neighbor index of each length-m subsequence under z-normalized
    Euclidean distance with exclusion zone ceil(m/4) (STOMP recursion)."""
    ts = np.asarray(time_series, dtype=np.float64)
    n = ts.shape[0]
    l = n - m + 1
    assert l > 1, 'Time series too short for the matrix profile.'
    ez = int(np.ceil(m / 4))

    windows = np.lib.stride_tricks.sliding_window_view(ts, m)
    mu = windows.mean(axis=1)
    sig = windows.std(axis=1)
    const = sig < 1e-13

    # initial sliding dot products against the first subsequence
    qt = np.array([np.dot(ts[:m], ts[j:j + m]) for j in range(l)], dtype=np.float64)
    qt_first = qt.copy()

    index = np.empty(l, dtype=np.int64)
    for i in range(l):
        if i > 0:
            # STOMP O(l) update: shift both query and candidates by one
            qt[1:] = qt[:-1] - ts[i - 1] * ts[:l - 1] + ts[i + m - 1] * ts[m:m + l - 1]
            qt[0] = qt_first[i]
        # squared z-normalized distance profile
        with np.errstate(divide='ignore', invalid='ignore'):
            corr = (qt - m * mu[i] * mu) / (m * sig[i] * sig)
        dist = 2.0 * m * (1.0 - corr)
        # constant-subsequence handling (stumpy convention):
        # both constant -> 0, exactly one constant -> m
        if const[i]:
            dist = np.full(l, float(m))
            dist[const] = 0.0
        else:
            dist[const] = float(m)
        dist[max(0, i - ez):i + ez + 1] = np.inf
        index[i] = int(np.argmin(dist))
    return index


def corrected_arc_curve(profile_index: np.ndarray, window_length: int,
                        excl_factor: int = 5) -> np.ndarray:
    """Corrected arc curve: crossings / idealized parabola, capped at 1, with
    excl_factor * L positions pinned to 1.0 at each end."""
    k = profile_index.shape[0]
    mark = np.zeros(k + 1, dtype=np.float64)
    idx = np.arange(k)
    small = np.minimum(idx, profile_index)
    large = np.maximum(idx, profile_index)
    np.add.at(mark, small, 1.0)
    np.add.at(mark, large, -1.0)
    crossings = np.cumsum(mark[:-1])
    ideal = 2.0 * idx * (k - idx) / k
    with np.errstate(divide='ignore', invalid='ignore'):
        cac = np.where(ideal > 0, np.minimum(crossings / ideal, 1.0), 1.0)
    zone = window_length * excl_factor
    cac[:zone] = 1.0
    cac[-zone:] = 1.0
    return cac


class FLUSS(Algorithm):
    """Arc-curve segmentation score ``1 - cac`` (reference fluss.py:32-52)."""

    def __init__(self, window_length: int) -> None:
        self.window_length = window_length

    def transform(self, time_series: np.ndarray) -> np.ndarray:
        assert time_series.ndim == 1, 'Time series needs to be an 1D array.'
        assert time_series.shape[0] > self.window_length, \
            'Time series needs to be longer than window length.'
        profile_index = matrix_profile_index(time_series, self.window_length)
        cac = corrected_arc_curve(profile_index, self.window_length)
        return 1 - cac
