"""SST kernel behavioral tests — mirrors the reference tests/test_sst.py
(same fixtures, seeds and assertions: all-methods smoke, zero prefix before
first_score_position, change peak beats 97th percentile, translation
invariance with mitigate_offset, fast-Hankel correlation > 0.95)."""
import numpy as np
import pytest

from changepoynt_spark.kernels import sst as ssts
from tests.fixtures import frequency_change_signal, outside_region, step_signal


@pytest.fixture(scope='module')
def step():
    return step_signal(300)


def test_all_methods_smoke(step):
    sst = ssts.SST(30)
    for method in list(sst.methods.keys()):
        score = ssts.SST(50, rank=2, method=method).transform(step)
        assert score.shape == step.shape
        assert np.isfinite(score).all()


def test_all_methods_with_offset_mitigation(step):
    sst = ssts.SST(30)
    for method in list(sst.methods.keys()):
        ssts.SST(50, rank=2, method=method, mitigate_offset=True).transform(step)


def test_rectangle_matrix(step):
    ssts.SST(50, 20, method='ika').transform(step)


def test_unknown_method():
    with pytest.raises(ValueError):
        ssts.SST(10, method='asdafwegrhqh')


def test_svd_method_rejects_fast_hankel(step):
    ssts.SST(50, method='svd').transform(step)
    with pytest.raises(ValueError):
        ssts.SST(50, method='svd', use_fast_hankel=True)


def test_rejects_fast_hankel_with_offset_mitigation():
    with pytest.raises(ValueError):
        ssts.SST(window_length=40, method='rsvd', use_fast_hankel=True, mitigate_offset=True)


def test_rejects_non_1d_input():
    signal, _ = frequency_change_signal()
    detector = ssts.SST(window_length=40, method='rsvd')
    with pytest.raises(AssertionError):
        detector.transform(np.vstack([signal, signal]))


def test_rejects_too_short_signal():
    detector = ssts.SST(window_length=40, n_windows=40, lag=10, method='rsvd')
    with pytest.raises(AssertionError):
        detector.transform(np.linspace(0.0, 1.0, 80))


def test_score_is_zero_before_first_possible_output():
    signal, _ = frequency_change_signal()
    detector = ssts.SST(window_length=40, n_windows=40, lag=10, rank=2, method='rsvd')
    np.random.seed(7)
    score = detector.transform(signal)
    np.testing.assert_allclose(score[:detector.first_score_position], 0.0)


@pytest.mark.parametrize('method', ['rsvd', 'ika', 'weighted'])
def test_detects_frequency_change_near_boundary(method):
    signal, change_idx = frequency_change_signal()
    detector = ssts.SST(window_length=48, n_windows=48, lag=16, rank=2, method=method)
    np.random.seed(11)
    score = detector.transform(signal)
    neighborhood = score[change_idx - 70: change_idx + 70]
    outside = outside_region(score, center=change_idx, half_width=140,
                             valid_start=detector.first_score_position)
    assert np.isfinite(score).all()
    assert neighborhood.max() > np.percentile(outside, 97)


def test_offset_mitigation_translation_invariance():
    signal, _ = frequency_change_signal(noise=0.01)
    shifted_signal = signal + 250.0
    detector = ssts.SST(window_length=40, n_windows=40, lag=10, rank=2, method='rsvd',
                        scale=False, mitigate_offset=True)
    np.random.seed(21)
    reference = detector.transform(signal)
    np.random.seed(21)
    shifted = detector.transform(shifted_signal)
    np.testing.assert_allclose(reference, shifted, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize('method', ['rsvd', 'ika'])
def test_fast_hankel_tracks_dense(method):
    signal, _ = frequency_change_signal()
    slow = ssts.SST(window_length=40, n_windows=40, lag=10, rank=2, method=method,
                    use_fast_hankel=False)
    fast = ssts.SST(window_length=40, n_windows=40, lag=10, rank=2, method=method,
                    use_fast_hankel=True)
    np.random.seed(31)
    slow_score = slow.transform(signal)
    np.random.seed(31)
    fast_score = fast.transform(signal)
    valid_start = slow.window_length + slow.n_windows // 2
    corr = np.corrcoef(slow_score[valid_start:], fast_score[valid_start:])[0, 1]
    assert np.isfinite(corr)
    assert corr > 0.95


def test_deterministic_methods_are_seed_independent(step):
    """naive / naive-updated use no randomness after scaling; two runs agree
    bit-for-bit regardless of seed (golden-anchor property)."""
    for method in ('naive', 'naive updated'):
        np.random.seed(1)
        a = ssts.SST(50, rank=2, method=method).transform(step)
        np.random.seed(999)
        b = ssts.SST(50, rank=2, method=method).transform(step)
        assert np.array_equal(a, b)


def test_seeded_stochastic_methods_are_reproducible(step):
    for method in ('ika', 'rsvd', 'weighted', 'symmetric', 'svd', 'fbrsvd'):
        np.random.seed(7)
        a = ssts.SST(50, rank=2, method=method).transform(step)
        np.random.seed(7)
        b = ssts.SST(50, rank=2, method=method).transform(step)
        assert np.array_equal(a, b), method


def test_batched_paths_bitmatch_the_sequential_loop(step):
    """The step-batched transforms run the same RNG stream as the per-step
    reference loop.  The dense methods and the svd hybrid are BIT-equal to
    the loop (this is the guard for the round-5 1-D power-loop rewrite);
    ika/rsvd batch their gram/sketch products in a different association
    order (gram-union / batched hankel svd), so they agree to float noise
    (<=1e-9 observed) — their exact bits are pinned by the frozen goldens
    instead."""
    from changepoynt_spark.kernels import linalg as lg
    from changepoynt_spark.kernels import normalization

    for method in ('naive', 'naive updated', 'weighted', 'symmetric',
                   'svd', 'ika', 'rsvd'):
        algo = ssts.SST(50, rank=2, method=method)
        np.random.seed(11)
        batched = algo.transform(step)

        scaled = normalization.min_max_scaling(step, min_val=1.0, max_val=2.0,
                                               inplace=False)
        np.random.seed(11)
        loop = ssts._transform(
            time_series=scaled, start_idx=algo.covered_regions()[0],
            offset=algo.compute_offset(), window_length=algo.window_length,
            n_windows=algo.n_windows, lag=algo.lag,
            scoring_step=algo.scoring_step,
            scoring_function=algo.methods[method],
            hankel_construction_function=lg.compile_hankel,
            mitigate_offset=algo.mitigate_offset)
        if method in ('ika', 'rsvd'):
            np.testing.assert_allclose(batched, loop, atol=1e-8, err_msg=method)
        else:
            assert np.array_equal(batched, loop), method


def test_scoring_step_smear():
    """scoring_step > 1 writes the same value into the smear slice
    [idx-off-ss//2, idx-off+(ss+1)//2) — reference sst.py:282-283."""
    signal, _ = frequency_change_signal()
    det = ssts.SST(window_length=40, n_windows=40, lag=10, rank=2, method='naive',
                   scoring_step=3)
    score = det.transform(signal)
    start = det.first_score_position
    assert score[:start].sum() == 0.0
    nonzero = np.flatnonzero(score)
    assert nonzero.size > 0
    assert nonzero[0] == start


def test_runtime_estimation():
    signal, _ = frequency_change_signal()
    det = ssts.SST(window_length=40, n_windows=40, lag=10, rank=2, method='rsvd')
    import time
    np.random.seed(31)
    estimate, _ = det.estimate_runtime(signal, steps=20)
    start = time.perf_counter()
    det.transform(signal)
    duration = time.perf_counter() - start
    assert estimate * 0.01 < duration < estimate * 10
