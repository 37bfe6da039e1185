"""Signal scaling/normalization primitives (numpy oracle).

Re-derives the semantics of the reference implementation
(/root/reference/changepoynt/utils/normalization.py:5-70) from scratch:
min-max scaling with a degenerate constant-signal branch, and z-scaling
that divides by std only when std != 0.
"""
from __future__ import annotations

import numpy as np


def min_max_scaling(time_series: np.ndarray, min_val: float = 0.0, max_val: float = 1.0,
                    inplace: bool = False) -> np.ndarray:
    """Scale a 1-D series into [min_val, max_val].

    Degenerate case (max == min): only subtract the minimum before applying
    the affine range map, matching reference normalization.py:33-38.
    """
    assert time_series.ndim == 1, 'Time series needs to be an 1D array.'
    if not inplace:
        time_series = time_series.copy()
    minimum = np.min(time_series, axis=0)
    maximum = np.max(time_series, axis=0)
    if maximum == minimum:
        time_series = time_series - minimum
    else:
        time_series = (time_series - minimum) / (maximum - minimum)
    return time_series * (max_val - min_val) + min_val


def z_scaling(time_series: np.ndarray, inplace: bool = False) -> np.ndarray:
    """Zero-mean the series; divide by std only if std is nonzero
    (reference normalization.py:45-70)."""
    assert time_series.ndim == 1, 'Time series needs to be an 1D array.'
    if not inplace:
        time_series = time_series.copy()
    mean = np.mean(time_series)
    std = np.std(time_series)
    time_series -= mean
    if std:
        time_series /= std
    return time_series
