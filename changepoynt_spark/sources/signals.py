"""Deterministic golden-carrier test signals, regenerated exactly per the
reference test suite (FIXTURES.md §3; reference tests/test_sst.py:10-21,
tests/test_sst.py:113-126, tests/test_msst.py:10-22,
examples/buffered_streaming_comparison.py:39-46)."""
from __future__ import annotations

import numpy as np


def step_signal(segment_length: int = 300) -> np.ndarray:
    """Three-level step signal, legacy global RNG seed 3455, exact call order."""
    np.random.seed(3455)
    n = segment_length
    x0 = 1 * np.ones(n) + np.random.rand(n) * 1
    x1 = 3 * np.ones(n) + np.random.rand(n) * 2
    x2 = 5 * np.ones(n) + np.random.rand(n) * 1.5
    x = np.hstack([x0, x1, x2])
    x += np.random.rand(x.size)
    return x


def frequency_change_signal(n_per_segment: int = 320, period_before: int = 48,
                            period_after: int = 14, noise: float = 0.02,
                            seed: int = 5678):
    """Sine frequency-change signal."""
    rng = np.random.default_rng(seed)
    t = np.arange(n_per_segment)
    left = np.sin(2 * np.pi * t / period_before)
    right = np.sin(2 * np.pi * t / period_after)
    signal = np.concatenate([left, right])
    signal += noise * rng.standard_normal(signal.shape[0])
    return signal, n_per_segment


def mean_shift_signal(n_per_segment: int = 320, level_before: float = 48.0,
                      level_after: float = 14.0, noise: float = 4.0, seed: int = 1234):
    """Mean-shift signal."""
    rng = np.random.default_rng(seed)
    left = level_before * np.ones(n_per_segment)
    right = level_after * np.ones(n_per_segment)
    signal = np.concatenate([left, right])
    signal += noise * rng.standard_normal(signal.shape[0])
    return signal, n_per_segment


def streaming_sine_signal(seed: int = 7):
    """Frequency-doubling sine."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 12 * np.pi, 300)
    sig = np.sin(t)
    sig[150:] = np.sin(t[150:] * 2.2)
    sig += 0.05 * rng.standard_normal(sig.shape[0])
    return sig
