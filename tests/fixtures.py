"""Deterministic test signals (re-exported from the package so the same
generators feed both the pytest suite and the datagen golden carriers) plus
shared assertion helpers."""
from __future__ import annotations

import numpy as np

from changepoynt_spark.sources.signals import (frequency_change_signal, mean_shift_signal,
                                               step_signal, streaming_sine_signal)

__all__ = ['frequency_change_signal', 'mean_shift_signal', 'step_signal',
           'streaming_sine_signal', 'outside_region']


def outside_region(score: np.ndarray, center: int, half_width: int, valid_start: int) -> np.ndarray:
    left = score[valid_start:max(valid_start, center - half_width)]
    right = score[min(center + half_width, score.shape[0]):]
    if left.size and right.size:
        return np.concatenate([left, right])
    if left.size:
        return left
    if right.size:
        return right
    raise AssertionError('Need some samples outside the change region for comparison.')
