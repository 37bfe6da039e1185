"""Sanity-check baseline scorers (numpy oracle).

Semantics of /root/reference/changepoynt/algorithms/baseline.py:23-98
(ZERO baseline of van den Burg & Williams 2020; moving-window mean/var
difference in the spirit of Wu & Keogh 2023).

Both are fully expressible in native Spark SQL / DuckDB SQL — they are the
engine's primary `queries()` / `oracle_sql()` correctness anchors (see
changepoynt_spark.operators.window_ops for the distributed form).
"""
from __future__ import annotations

import numpy as np

from changepoynt_spark.kernels.base import Algorithm


class ZERO(Algorithm):
    """Returns an all-zero score channel (reference baseline.py:23-39)."""

    def fit(self, time_series: np.ndarray) -> None:
        pass

    def transform(self, time_series: np.ndarray) -> np.ndarray:
        return np.zeros_like(time_series)


class MovingWindow(Algorithm):
    """|mean_t - mean_{t+w}| and/or |var_t - var_{t+w}| of length-w sliding
    windows, scored at offsets [w, T-w+1), zeros elsewhere (reference
    baseline.py:42-98)."""

    def __init__(self, window_length: int, method: str = 'mean') -> None:
        possible_methods = {'mean', 'var', 'meanvar'}
        self.__fit = False
        assert window_length > 0, 'Window length must be greater than zero.'
        self.window_length = window_length
        assert method in possible_methods, f'Method must be one of the following: {possible_methods}.'
        self.method = method

    def fit(self, time_series: np.ndarray) -> None:
        assert time_series.ndim == 1, 'Time series needs to be an 1D array.'
        assert time_series.shape[0] > 2 * self.window_length, \
            'Time series needs to be longer than 2x window length.'
        self.__fit = True

    def transform(self, time_series: np.ndarray) -> np.ndarray:
        if not self.__fit:
            self.fit(time_series)
        sliding_window = np.lib.stride_tricks.sliding_window_view(time_series, self.window_length)
        sliding_window_var = np.var(sliding_window, axis=-1)
        sliding_window_mean = np.mean(sliding_window, axis=-1)
        score = np.zeros_like(time_series)
        if self.method.startswith('mean'):
            score[self.window_length:-self.window_length + 1] += np.abs(
                sliding_window_mean[:-self.window_length] - sliding_window_mean[self.window_length:])
        if self.method.endswith('var'):
            score[self.window_length:-self.window_length + 1] += np.abs(
                sliding_window_var[:-self.window_length] - sliding_window_var[self.window_length:])
        return score
