"""Baseline / BOCPD / FLUSS / RuLSIF / normalization / dead-op kernel tests,
mirroring the reference tests (test_baseline.py, test_bocpd.py, test_fluss.py,
test_rulsif.py, test_ulsif.py, test_floss.py, test_clasp.py, test_si.py)."""
import numpy as np
import pytest

from changepoynt_spark.kernels import (BOCPD, CLASP, FLOSS, FLUSS, KLIEP, ZERO, MovingWindow,
                                       RuLSIF, SubspaceIdentification, ULSIF)
from changepoynt_spark.kernels import normalization
from tests.fixtures import step_signal


@pytest.fixture(scope='module')
def step():
    return step_signal(300)


@pytest.fixture(scope='module')
def short_step():
    return step_signal(200)


# -- normalization -----------------------------------------------------------

def test_min_max_scaling_range_and_degenerate():
    x = np.array([2.0, 4.0, 6.0])
    scaled = normalization.min_max_scaling(x, 1.0, 2.0)
    np.testing.assert_allclose(scaled, [1.0, 1.5, 2.0])
    const = np.full(5, 3.0)
    scaled_const = normalization.min_max_scaling(const, 1.0, 2.0)
    # degenerate branch: only subtract min, then affine map -> all min_val
    np.testing.assert_allclose(scaled_const, np.full(5, 1.0))


def test_z_scaling():
    x = np.array([1.0, 2.0, 3.0])
    z = normalization.z_scaling(x)
    np.testing.assert_allclose(z.mean(), 0.0, atol=1e-12)
    np.testing.assert_allclose(z.std(), 1.0, atol=1e-12)
    const = np.full(4, 2.0)
    np.testing.assert_allclose(normalization.z_scaling(const), np.zeros(4))


# -- baselines ---------------------------------------------------------------

def test_zero(step):
    score = ZERO().transform(step)
    assert np.array_equal(score, np.zeros_like(step))


@pytest.mark.parametrize('method', ['mean', 'var', 'meanvar'])
def test_moving_window(step, method):
    score = MovingWindow(50, method=method).transform(step)
    assert score.shape == step.shape
    # zeros outside the valid scoring band
    assert np.all(score[:50] == 0.0)
    assert np.all(score[-49:] == 0.0)
    # the step changes at 300 and 600 should dominate for the mean method
    if method == 'mean':
        assert score[250:350].max() > np.median(score[score > 0]) * 2


def test_moving_window_matches_naive_loop(step):
    w = 50
    score = MovingWindow(w, method='mean').transform(step)
    # independent naive re-computation
    expected = np.zeros_like(step)
    for i in range(w, step.shape[0] - w + 1):
        expected[i] = abs(step[i - w:i].mean() - step[i:i + w].mean())
    np.testing.assert_allclose(score, expected, atol=1e-12)


def test_moving_window_validations(step):
    with pytest.raises(AssertionError):
        MovingWindow(0)
    with pytest.raises(AssertionError):
        MovingWindow(10, method='nope')
    with pytest.raises(AssertionError):
        MovingWindow(500).transform(step[:600])


# -- BOCPD -------------------------------------------------------------------

def test_bocpd_detects_steps(step):
    det = BOCPD(200)
    score = det.transform(step)
    assert score.shape == step.shape
    assert np.isfinite(score).all()
    assert score.min() >= 0.0 and score.max() <= 1.0 + 1e-9
    # change-point probability spikes near the breaks at 300 and 600
    assert score[290:340].max() > 0.5
    assert score[590:640].max() > 0.5


def test_bocpd_explicit_priors(step):
    det = BOCPD(200, 0, 1, 1, 10)
    score = det.transform(step)
    assert np.isfinite(score).all()


def test_bocpd_deterministic(step):
    a = BOCPD(200).transform(step)
    b = BOCPD(200).transform(step)
    assert np.array_equal(a, b)


def test_bocpd_threshold_type():
    with pytest.raises(AssertionError):
        BOCPD(200, change_length_threshold=1.5)


# -- FLUSS -------------------------------------------------------------------

def test_fluss_segments_step_signal(short_step):
    det = FLUSS(20)
    score = det.transform(short_step)
    assert score.shape[0] == short_step.shape[0] - 20 + 1
    assert np.isfinite(score).all()
    assert score.min() >= 0.0 and score.max() <= 1.0
    # segmentation peak near a regime boundary (200 or 400)
    peak = int(np.argmax(score))
    assert min(abs(peak - 200), abs(peak - 400)) < 60


def test_fluss_rejects_short_signal():
    with pytest.raises(AssertionError):
        FLUSS(50).transform(np.arange(40, dtype=np.float64))


def test_fluss_deterministic(short_step):
    a = FLUSS(20).transform(short_step)
    b = FLUSS(20).transform(short_step)
    assert np.array_equal(a, b)


# -- RuLSIF / ULSIF ----------------------------------------------------------

def test_rulsif_detects_steps(step):
    np.random.seed(3455)
    det = RuLSIF(scoring_step=4)
    score = det.transform(step)
    assert score.shape == step.shape
    assert np.isfinite(score).all()
    # density-ratio divergence spikes near the breaks
    interior = score[120:-120]
    assert interior.max() > 0
    peaks = np.argsort(score)[-20:]
    assert any(abs(int(p) - 300) < 80 or abs(int(p) - 600) < 80 for p in peaks)


def test_rulsif_seeded_reproducible(step):
    np.random.seed(3455)
    a = RuLSIF(scoring_step=8).transform(step)
    np.random.seed(3455)
    b = RuLSIF(scoring_step=8).transform(step)
    assert np.array_equal(a, b)


def test_rulsif_alpha_bounds():
    with pytest.raises(AssertionError):
        RuLSIF(alpha=1.5)


def test_ulsif_is_rulsif_alpha_zero(step):
    det = ULSIF(scoring_step=8)
    assert det.alpha == 0.0
    np.random.seed(3455)
    a = det.transform(step)
    np.random.seed(3455)
    b = RuLSIF(alpha=0.0, scoring_step=8).transform(step)
    assert np.array_equal(a, b)


def test_rulsif_estimation_lag_detects_steps(step):
    """estimation_lag re-runs the (sigma, lambda) CV only every k steps —
    the reference declares this parameter but never uses it; the engine
    implements it.  Must stay deterministic and still find the breaks."""
    np.random.seed(3455)
    det = RuLSIF(scoring_step=4, estimation_lag=16)
    score = det.transform(step)
    assert np.isfinite(score).all()
    peaks = np.argsort(score)[-20:]
    assert any(abs(int(p) - 300) < 80 or abs(int(p) - 600) < 80 for p in peaks)
    np.random.seed(3455)
    again = RuLSIF(scoring_step=4, estimation_lag=16).transform(step)
    assert np.array_equal(score, again)


# -- KLIEP -------------------------------------------------------------------
# "Planned" in the reference with no implementation (README.md:172) — this
# engine implements the real algorithm (Sugiyama 2008 / Kawahara-Sugiyama 2009)

def test_kliep_detects_steps(step):
    np.random.seed(3455)
    score = KLIEP(window_length=4, n_windows=8, scoring_step=4).transform(step)
    assert score.shape == step.shape
    assert np.isfinite(score).all()
    peaks = np.argsort(score)[-20:]
    assert any(abs(int(p) - 300) < 80 or abs(int(p) - 600) < 80 for p in peaks)


def test_kliep_seeded_reproducible(step):
    np.random.seed(3455)
    a = KLIEP(window_length=4, n_windows=8, scoring_step=8).transform(step)
    np.random.seed(3455)
    b = KLIEP(window_length=4, n_windows=8, scoring_step=8).transform(step)
    assert np.array_equal(a, b)


def test_kliep_step_batched_equals_per_step_estimator(step):
    """The chunked step-batched transform must be bit-identical to the naive
    per-step KLIEPEstimator loop through the shared ``_transform`` (same RNG
    draw order: centers, ref-CV, test-CV per step)."""
    from changepoynt_spark.kernels import density_ratio as dr
    np.random.seed(5)
    batched = KLIEP(window_length=4, n_windows=8, scoring_step=4).transform(step)
    np.random.seed(5)
    ts = step.copy()
    starting = 4 + 8 + 8
    est = dr.KLIEPEstimator(kernel_number=100)
    forward = dr._transform(ts, starting, 4, 8, 8, 4, est)
    backward = dr._transform(ts[::-1], starting, 4, 8, 8, 4, est)
    assert np.array_equal(batched, forward + backward[::-1])


def test_kliep_chunk_boundary_invariance(step):
    """Scores must not depend on the step_batch chunk size (sigma carry-over
    crosses chunk boundaries)."""
    np.random.seed(17)
    det = KLIEP(window_length=4, n_windows=8, scoring_step=4, estimation_lag=8)
    a = det.transform(step)
    small = KLIEP(window_length=4, n_windows=8, scoring_step=4, estimation_lag=8)
    small.step_batch = 7  # deliberately misaligned with estimation_lag
    np.random.seed(17)
    b = small.transform(step)
    assert np.array_equal(a, b)


def test_kliep_estimation_lag_rng_stream_alignment(step):
    """Skip-CV steps consume dummy permutation draws: scores at re-estimation
    steps bit-match the estimation_lag=None path (non-symmetric so forward
    step indices map 1:1 to score positions)."""
    np.random.seed(21)
    full = KLIEP(window_length=4, n_windows=8, scoring_step=4,
                 symmetric=False).transform(step)
    np.random.seed(21)
    lagged = KLIEP(window_length=4, n_windows=8, scoring_step=4,
                   estimation_lag=8, symmetric=False).transform(step)
    start = 4 + 8 + 8
    reest = [start - 8 + 4 * i for i in range(0, len(step), 8)
             if start + 4 * i < len(step)]
    assert all(full[p] == lagged[p] for p in reest)
    assert not np.array_equal(full, lagged)


def test_kliep_symmetric_sums_passes(step):
    np.random.seed(11)
    sym = KLIEP(window_length=4, n_windows=8, scoring_step=8).transform(step)
    np.random.seed(11)
    fwd = KLIEP(window_length=4, n_windows=8, scoring_step=8,
                symmetric=False).transform(step)
    bwd_region = sym - fwd
    assert np.isfinite(bwd_region).all()
    assert not np.array_equal(sym, fwd)


# -- dead ops (API parity) ----------------------------------------------------

@pytest.mark.parametrize('cls', [FLOSS, CLASP, SubspaceIdentification])
def test_dead_algorithms_raise(cls):
    with pytest.raises(NotImplementedError):
        cls(20)


def test_rulsif_estimation_lag_rng_stream_alignment(step):
    """Skipped-CV steps consume dummy permutation draws, so the global RNG
    stream matches the estimation_lag=None path: scores at re-estimation
    steps are bit-identical, and the lag path diverges only BETWEEN them."""
    import numpy as np
    np.random.seed(99)
    full = RuLSIF(window_length=4, n_windows=8, scoring_step=4).transform(step)
    np.random.seed(99)
    lagged = RuLSIF(window_length=4, n_windows=8, scoring_step=4,
                    estimation_lag=3).transform(step)
    start = 4 + 8 + 8  # starting_point = w + n + lag(defaults to n)
    # forward pass writes score at idx-n for idx = start, start+4, ...;
    # re-estimation steps are i % 3 == 0
    reest = [start - 8 + 4 * i for i in range(0, len(step), 3)
             if start + 4 * i < len(step)]
    agree = [p for p in reest if full[p] == lagged[p]]
    assert len(agree) == len(reest), f'{len(agree)}/{len(reest)} re-estimation steps match'
    assert not np.array_equal(full, lagged)  # cached params DO differ between


def test_tesst_requires_cuda_torch_like_reference():
    """Reference parity: TESST's constructor asserts a CUDA torch install
    (torch_esst.py:43); without one — as in this environment — construction
    must fail at __init__ with the same requirement."""
    from changepoynt_spark.kernels import TESST
    with pytest.raises((ImportError, AssertionError, NotImplementedError)):
        TESST(window_length=30)


def test_batched_width_candidates_bitmatch_per_step():
    """r9: the KLIEP chunk's batched Jaakkola sigma candidates must equal
    the per-step estimator helper bit-for-bit, including degenerate
    duplicate-column steps (zero distances masked, nanmedian == median of
    the filtered multiset)."""
    import numpy as np
    from changepoynt_spark.kernels.density_ratio import (
        DensityRatioEstimator, _width_candidates_batched)
    rng = np.random.default_rng(17)
    B, w, n = 64, 4, 8
    refs = rng.standard_normal((B, w, n))
    tests = rng.standard_normal((B, w, n))
    refs[3][:, 2] = refs[3][:, 1]        # duplicated columns -> zero distances
    tests[9][:, 5] = tests[9][:, 0]
    exp = np.stack([
        DensityRatioEstimator.compute_gaussian_width_candidates(refs[i], tests[i])
        for i in range(B)])
    got = _width_candidates_batched(refs, tests)
    assert np.array_equal(exp, got)
