"""ESST kernel behavioral tests — mirrors the reference tests/test_esst.py."""
import numpy as np
import pytest

from changepoynt_spark.kernels.esst import ESST
from tests.fixtures import frequency_change_signal, outside_region


def _signal(noise=0.02):
    return frequency_change_signal(noise=noise, seed=1234)


def test_unknown_method_raises_value_error():
    with pytest.raises(ValueError):
        ESST(window_length=40, method='does-not-exist')


def test_rejects_fast_hankel_for_fbrsvd():
    with pytest.raises(ValueError):
        ESST(window_length=40, method='fbrsvd', use_fast_hankel=True)


def test_rejects_fast_hankel_with_offset_mitigation():
    with pytest.raises(ValueError):
        ESST(window_length=40, method='rsvd', use_fast_hankel=True, mitigate_offset=True)


def test_rejects_non_1d_input():
    signal, _ = _signal()
    with pytest.raises(AssertionError):
        ESST(window_length=40, method='rsvd').transform(np.vstack([signal, signal]))


def test_rejects_too_short_signal():
    detector = ESST(window_length=40, n_windows=20, lag=20, method='rsvd')
    with pytest.raises(AssertionError):
        detector.transform(np.linspace(0.0, 1.0, 78))


def test_score_is_zero_before_first_possible_output():
    signal, _ = _signal()
    detector = ESST(window_length=40, n_windows=20, lag=20, method='rsvd')
    np.random.seed(7)
    score = detector.transform(signal)
    np.testing.assert_allclose(score[:detector.first_score_position], 0.0)


def test_detects_frequency_change_near_boundary():
    signal, change_idx = _signal()
    detector = ESST(window_length=48, n_windows=24, lag=24, rank=2, method='rsvd')
    np.random.seed(11)
    score = detector.transform(signal)
    neighborhood = score[change_idx - 60: change_idx + 60]
    outside = outside_region(score, center=change_idx, half_width=120,
                             valid_start=detector.window_length)
    assert np.isfinite(score).all()
    assert neighborhood.max() > np.percentile(outside, 97)


def test_offset_mitigation_translation_invariance():
    signal, _ = _signal(noise=0.01)
    shifted_signal = signal + 250.0
    detector = ESST(window_length=40, n_windows=20, lag=20, rank=2, method='rsvd',
                    scale=False, mitigate_offset=True)
    np.random.seed(21)
    reference = detector.transform(signal)
    np.random.seed(21)
    shifted = detector.transform(shifted_signal)
    np.testing.assert_allclose(reference, shifted, rtol=1e-6, atol=1e-7)


def test_fast_hankel_tracks_dense():
    signal, _ = _signal()
    slow = ESST(window_length=40, n_windows=20, lag=20, rank=2, method='rsvd',
                use_fast_hankel=False)
    fast = ESST(window_length=40, n_windows=20, lag=20, rank=2, method='rsvd',
                use_fast_hankel=True)
    np.random.seed(31)
    slow_score = slow.transform(signal)
    np.random.seed(31)
    fast_score = fast.transform(signal)
    valid_start = slow.window_length
    corr = np.corrcoef(slow_score[valid_start:], fast_score[valid_start:])[0, 1]
    assert np.isfinite(corr)
    assert corr > 0.95


def test_seeded_reproducibility():
    signal, _ = _signal()
    det = ESST(window_length=40, n_windows=20, lag=20, rank=2, method='rsvd')
    np.random.seed(7)
    a = det.transform(signal)
    np.random.seed(7)
    b = det.transform(signal)
    assert np.array_equal(a, b)
