"""Relative density-ratio change-point scoring: RuLSIF / uLSIF (numpy oracle).

Re-derives, scipy/numba-free, the semantics of the reference
(/root/reference/changepoynt/algorithms/rulsif.py:8-119,
/root/reference/changepoynt/algorithms/ulsif.py:6-54 and the estimator in
/root/reference/changepoynt/utils/densityratioestimation.py:87-523;
Liu et al., Neural Networks 43 (2013); Yamada et al., NIPS 2011):

- per step: a (w, 2n) trajectory matrix split into reference/test halves,
  normalized in place by the joint per-row std,
- Gaussian kernel model with <=100 random centers drawn from the reference
  half; sigma candidates via Jaakkola's median heuristic x {0.6..1.4},
  lambda candidates 10^{-3..1}; 5-fold CV; score = Pearson divergence,
- ``symmetric=True`` adds a reversed-signal pass, summed
  (reference rulsif.py:76-92); the reference's optional 2-process pool is
  dropped — Spark parallelizes across series instead,
- the sigma re-scaling trick K**(sigma_old^2/sigma_new^2) is kept verbatim
  (reference densityratioestimation.py:134-143).

Substitutions (documented tolerance deviations, our oracle defines goldens):
LAPACK ``sysv`` -> ``np.linalg.solve``; ``scipy.spatial.distance.pdist`` ->
numpy broadcast. RNG: exactly three global ``np.random.permutation`` draws
per scoring step (centers, ref-CV, test-CV), same order as the reference.
"""
from __future__ import annotations

import numpy as np

from changepoynt_spark.kernels import linalg as lg
from changepoynt_spark.kernels.base import Algorithm


# ---------------------------------------------------------------------------
# estimator numerics
# ---------------------------------------------------------------------------

def compute_distance(samples: np.ndarray, sample_means: np.ndarray) -> np.ndarray:
    """Squared-distance matrix between column-sample sets via the
    (a-b)^2 = a^2 - 2ab + b^2 expansion (reference dre.py:87-114)."""
    squared_samples = np.sum(samples ** 2, 0)
    squared_means = np.sum(sample_means ** 2, 0)
    return squared_means[None, :] + squared_samples[:, None] - 2 * samples.T @ sample_means


def compute_gaussian_kernel(samples: np.ndarray, sample_means: np.ndarray, sigma: float) -> np.ndarray:
    return np.exp(-compute_distance(samples, sample_means) / (2 * (sigma ** 2)))


def update_sigma_gaussian_kernel(old_kernel_values: np.ndarray, old_sigma: float, new_sigma: float):
    """exp(-d/(2 s_new^2)) = exp(-d/(2 s_old^2)) ** (s_old^2 / s_new^2)."""
    return old_kernel_values ** ((old_sigma ** 2) / (new_sigma ** 2))


def compute_h_hat_matrix(alpha, k_ref, k_test):
    n_ref = k_ref.shape[1]
    n_test = k_test.shape[1]
    return ((alpha / n_ref) * k_ref @ k_ref.T
            + ((1.0 - alpha) / n_test) * k_test @ k_test.T)


def compute_h_hat_vector(k_ref):
    return np.mean(k_ref, axis=1, keepdims=True)


def compute_theta_hat(h_hat_matrix, lambda_scaled_identity, h_hat_vector):
    """Solve (H + lambda I) theta = h.  The reference uses a de-checked LAPACK
    symmetric solver; np.linalg.solve (general LU) is exact to round-off."""
    return np.linalg.solve(h_hat_matrix + lambda_scaled_identity, h_hat_vector)


def j_of_theta(alpha, g_xref_theta, g_xtest_theta):
    return ((alpha / 2.0) * np.mean(g_xref_theta ** 2)
            + ((1 - alpha) / 2.0) * np.mean(g_xtest_theta ** 2)
            - np.mean(g_xref_theta))


def g_of_x_theta(kernel_matrix_samples, theta_hat):
    return theta_hat.T @ kernel_matrix_samples


class DensityRatioEstimator:
    """alpha-relative Pearson-divergence estimator via least-squares density
    ratio fitting with k-fold CV over (sigma, lambda)
    (reference densityratioestimation.py:300-523)."""

    def __init__(self, alpha=0.1, kernel_number=100, cross_folds=5, sigma: float = None,
                 lambda_: float = None):
        self.alpha = alpha
        self.kernel_number = kernel_number
        self.cross_folds = cross_folds
        self.gaussian_centers = None
        self.sigma_width = sigma
        self.lambda_regularizer = lambda_
        self.cv = self.sigma_width is None or self.lambda_regularizer is None

    @staticmethod
    def compute_gaussian_width_candidates(reference_samples, test_samples):
        """Jaakkola's median heuristic over pairwise squared distances of the
        joint sample, scaled by {0.6, 0.8, 1.0, 1.2, 1.4} (reference
        dre.py:321-353).  pdist is replaced by a numpy upper-triangle
        broadcast — identical values."""
        samples = np.c_[reference_samples, test_samples].T  # rows = points
        sq = np.sum(samples ** 2, axis=1)
        dist = sq[:, None] + sq[None, :] - 2.0 * samples @ samples.T
        iu = np.triu_indices(samples.shape[0], 1)
        distances = dist[iu]
        median_distance = np.sqrt(0.5 * np.median(distances[distances > 0]))
        return median_distance * np.array([0.6, 0.8, 1, 1.2, 1.4])

    @staticmethod
    def generate_regularization_params():
        return 10.0 ** np.array([-3, -2, -1, 0, 1])

    def generate_gaussian_centers(self, reference_samples):
        numcols = reference_samples.shape[1]
        reference_sample_idxs = np.random.permutation(numcols)
        self.kernel_number = min(self.kernel_number, numcols)
        return reference_samples[:, reference_sample_idxs[0:self.kernel_number]]

    @staticmethod
    def cross_validate(reference_samples, test_samples, gaussian_centers, sigma_widths,
                       lambda_candidates, alpha, kernel_number, cross_folds=5):
        ref_cols = reference_samples.shape[1]
        test_cols = test_samples.shape[1]
        cross_validation_scores = np.zeros((sigma_widths.shape[0], lambda_candidates.shape[0]))

        reference_samples_cv_idxs = np.random.permutation(ref_cols)
        reference_samples_cv_split = (np.arange(start=0, stop=ref_cols, step=1) * cross_folds) // ref_cols
        test_samples_cv_idxs = np.random.permutation(test_cols)
        test_samples_cv_split = (np.arange(start=0, stop=test_cols, step=1) * cross_folds) // test_cols

        identity = np.eye(kernel_number)

        # sigma chain: the reference's power-update trick is SEQUENTIAL
        # (K_{i+1} = K_i ** (s_i^2/s_{i+1}^2)); keep that exact chain, but
        # STACK the five kernels so every (sigma, lambda) system per fold is
        # one batched solve + one batched gemm.  Tiny per-call Python
        # dispatch (10k solves + 32k np.mean per series) dominated the
        # profile; the math per slice is unchanged, so outputs are
        # bit-identical (frozen-golden-asserted).
        k_ref = compute_gaussian_kernel(reference_samples, gaussian_centers, sigma_widths[0]).T
        k_test = compute_gaussian_kernel(test_samples, gaussian_centers, sigma_widths[0]).T
        old_sigma = sigma_widths[0]
        k_refs, k_tests = [], []
        for sigma in sigma_widths:
            k_ref = update_sigma_gaussian_kernel(k_ref, old_sigma, sigma)
            k_test = update_sigma_gaussian_kernel(k_test, old_sigma, sigma)
            old_sigma = sigma
            k_refs.append(k_ref)
            k_tests.append(k_test)
        k_refs = np.stack(k_refs)      # (S, k, n_ref)
        k_tests = np.stack(k_tests)    # (S, k, n_test)
        n_sigma, n_lambda = len(sigma_widths), len(lambda_candidates)
        lam_eyes = identity[None, :, :] * lambda_candidates[:, None, None]

        for fold_idx in range(cross_folds):
            tr_r = reference_samples_cv_idxs[reference_samples_cv_split != fold_idx]
            tr_t = test_samples_cv_idxs[test_samples_cv_split != fold_idx]
            te_r = reference_samples_cv_idxs[reference_samples_cv_split == fold_idx]
            te_t = test_samples_cv_idxs[test_samples_cv_split == fold_idx]
            kr_tr, kt_tr = k_refs[:, :, tr_r], k_tests[:, :, tr_t]
            h_mats = ((alpha / kr_tr.shape[2])
                      * np.matmul(kr_tr, kr_tr.transpose(0, 2, 1))
                      + ((1.0 - alpha) / kt_tr.shape[2])
                      * np.matmul(kt_tr, kt_tr.transpose(0, 2, 1)))    # (S,k,k)
            h_vecs = np.mean(kr_tr, axis=2, keepdims=True)             # (S,k,1)
            ridges = (h_mats[:, None, :, :] + lam_eyes[None, :, :, :]) \
                .reshape(n_sigma * n_lambda, kernel_number, kernel_number)
            rhs = np.broadcast_to(h_vecs[:, None], (n_sigma, n_lambda,
                                                    kernel_number, 1)) \
                .reshape(n_sigma * n_lambda, kernel_number, 1)
            thetas = np.linalg.solve(ridges, rhs) \
                .reshape(n_sigma, n_lambda, kernel_number, 1)
            g_ref = np.matmul(thetas.transpose(0, 1, 3, 2),
                              k_refs[:, None, :, :][..., te_r])        # (S,L,1,mr)
            g_test = np.matmul(thetas.transpose(0, 1, 3, 2),
                               k_tests[:, None, :, :][..., te_t])      # (S,L,1,mt)
            cross_validation_scores += (
                (alpha / 2.0) * np.mean(g_ref ** 2, axis=(2, 3))
                + ((1 - alpha) / 2.0) * np.mean(g_test ** 2, axis=(2, 3))
                - np.mean(g_ref, axis=(2, 3)))
        return cross_validation_scores / cross_folds

    def compute_model_parameters(self, reference_samples, test_samples, gaussian_centers):
        sigma_widths = self.compute_gaussian_width_candidates(reference_samples, test_samples)
        lambda_candidates = self.generate_regularization_params()
        scores = self.cross_validate(reference_samples, test_samples, gaussian_centers,
                                     sigma_widths, lambda_candidates, self.alpha,
                                     self.kernel_number, self.cross_folds)
        sigma_idx, lambda_idx = np.unravel_index(scores.argmin(), scores.shape)
        return sigma_widths[sigma_idx], lambda_candidates[lambda_idx]

    def train(self, reference_samples, test_samples):
        self.gaussian_centers = self.generate_gaussian_centers(reference_samples)
        if self.cv:
            self.sigma_width, self.lambda_regularizer = self.compute_model_parameters(
                reference_samples, test_samples, self.gaussian_centers)

    def apply(self, reference_samples, test_samples):
        if self.gaussian_centers is None or self.kernel_number is None:
            raise Exception('Missing kernel basis function parameters')
        if self.sigma_width == 0.0 or self.lambda_regularizer == 0.0:
            raise Exception('Missing model selection parameters')
        k_ref = compute_gaussian_kernel(reference_samples, self.gaussian_centers, self.sigma_width).T
        k_test = compute_gaussian_kernel(test_samples, self.gaussian_centers, self.sigma_width).T
        h_matrix = compute_h_hat_matrix(self.alpha, k_ref, k_test)
        h_vector = compute_h_hat_vector(k_ref)
        theta_hat = compute_theta_hat(
            h_matrix, self.lambda_regularizer * np.eye(self.kernel_number), h_vector)
        r_alpha_xref = g_of_x_theta(k_ref, theta_hat)
        r_alpha_xtest = g_of_x_theta(k_test, theta_hat)
        pe_divergence = (np.mean(r_alpha_xref)
                         - (0.5 * (self.alpha * np.mean(r_alpha_xref ** 2)
                                   + (1.0 - self.alpha) * np.mean(r_alpha_xtest ** 2))) - 0.5)
        return pe_divergence

    def __call__(self, reference_samples: np.ndarray, test_samples: np.ndarray):
        # joint per-row std normalization, in place on the (per-step, freshly
        # built) trajectory slices — reference dre.py:510-517
        all_samples = np.c_[reference_samples, test_samples]
        std = np.std(all_samples, axis=1) + np.finfo(float).eps
        reference_samples /= std[:, None]
        test_samples /= std[:, None]
        self.train(reference_samples, test_samples)
        return self.apply(reference_samples, test_samples)


# ---------------------------------------------------------------------------
# scoring algorithms
# ---------------------------------------------------------------------------

class RuLSIF(Algorithm):
    """Relative density-ratio change score (reference rulsif.py:8-119)."""

    def __init__(self, window_length: int = 10, n_windows: int = 50, lag: int = None,
                 estimation_lag: int = None, scoring_step: int = 1, n_kernels: int = 100,
                 alpha: float = 0.01, symmetric: bool = True, parallel: bool = False) -> None:
        self.window_length = window_length
        self.n_windows = n_windows
        self.lag = lag
        self.estimation_lag = estimation_lag
        self.n_kernels = n_kernels
        self.alpha = alpha
        self.scoring_step = scoring_step
        self.symmetric = symmetric
        self.parallel = parallel  # kept for API parity; Spark parallelizes across series
        assert 0 <= self.alpha < 1, 'The alpha parameter should be in the interval [0,1).'
        assert self.estimation_lag is None or 1 <= self.estimation_lag, \
            'The estimation lag needs to be bigger than zero samples.'
        if not self.lag:
            self.lag = self.n_windows

    def transform(self, time_series: np.ndarray):
        assert time_series.ndim == 1, 'Time series needs to be an 1D array.'
        starting_point = self.window_length + self.n_windows + self.lag
        assert starting_point < time_series.shape[0], 'The time series is too short to score any points.'
        estimator = DensityRatioEstimator(self.alpha)
        time_series = time_series.copy()
        if self.symmetric:
            forward = _transform(time_series, starting_point, self.window_length, self.n_windows,
                                 self.lag, self.scoring_step, estimator, self.estimation_lag)
            backward = _transform(time_series[::-1], starting_point, self.window_length,
                                  self.n_windows, self.lag, self.scoring_step, estimator,
                                  self.estimation_lag)
            return forward + backward[::-1]
        return _transform(time_series, starting_point, self.window_length, self.n_windows,
                          self.lag, self.scoring_step, estimator, self.estimation_lag)


def _transform(time_series: np.ndarray, starting_point: int, window_length: int, n_windows: int,
               lag: int, scoring_step: int, estimator: DensityRatioEstimator,
               estimation_lag: int = None) -> np.ndarray:
    """Per-step density-ratio scoring.  ``estimation_lag`` (the reference
    stores this parameter but never reads it, rulsif.py:33,42) is implemented
    here: the (sigma, lambda) cross-validation — 125 linear solves per step —
    re-runs only every ``estimation_lag`` steps; in between, the cached model
    parameters are reused.  Skipped steps still consume cross_validate's two
    permutation draws (as dummies), so the global RNG stream stays aligned
    with the estimation_lag=None path: center draws are identical at every
    step, and scores at re-estimation steps bit-match the default path
    (asserted in tests).  None = re-estimate every step (reference behavior,
    golden path)."""
    score = np.zeros_like(time_series)
    offset = n_windows
    cv_orig = estimator.cv
    for i, idx in enumerate(range(starting_point, time_series.shape[0], scoring_step)):
        skip_cv = bool(estimation_lag) and (i % estimation_lag) != 0
        if estimation_lag:
            estimator.cv = False if skip_cv else cv_orig
        hankel_matrix = lg.compile_hankel(time_series, idx, window_length, 2 * n_windows)
        score[idx - offset - scoring_step // 2:idx - offset + (scoring_step + 1) // 2] = \
            estimator(hankel_matrix[:, :n_windows], hankel_matrix[:, n_windows:])
        if skip_cv:
            # cross_validate would have drawn ref-CV and test-CV permutations
            np.random.permutation(n_windows)
            np.random.permutation(n_windows)
    estimator.cv = cv_orig
    return score


class ULSIF(RuLSIF):
    """uLSIF = RuLSIF with alpha = 0 (reference ulsif.py:6-54)."""

    def __init__(self, window_length: int = 10, n_windows: int = 50, lag: int = None,
                 estimation_lag: int = None, scoring_step: int = 1, n_kernels: int = 100,
                 symmetric: bool = True, parallel: bool = False) -> None:
        super().__init__(window_length=window_length, n_windows=n_windows, lag=lag,
                         estimation_lag=estimation_lag, scoring_step=scoring_step,
                         n_kernels=n_kernels, alpha=0.0, symmetric=symmetric, parallel=parallel)
