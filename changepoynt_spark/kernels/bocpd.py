"""Bayesian Online Change-Point Detection (numpy oracle).

Re-derives, scipy-free, the semantics of the reference BOCPD
(/root/reference/changepoynt/algorithms/bocpd.py:28-227; Adams & MacKay 2007,
Gaussian model with unknown mean per Murphy 2007):

- priors estimated from length-``run_length`` sliding windows: median of
  window means, variance of window means, median of window variances
  (reference bocpd.py:45-66; the reference's debug ``print`` is dropped),
- constant hazard 1/run_length,
- O(T^2) run-length posterior recursion,
- score = P(run length <= change_length_threshold) per step.

scipy.stats.norm.logpdf is replaced with the closed-form Gaussian log-pdf and
scipy.special.logsumexp with a max-shifted numpy logsumexp — both exact.

Fully deterministic — a golden anchor. NOTE for the engine: memory is
O(T^2); the Spark layer chunks long series before dispatching this kernel.
"""
from __future__ import annotations

import numpy as np

from changepoynt_spark.kernels.base import Algorithm


def _logsumexp(a: np.ndarray) -> float:
    m = np.max(a)
    if not np.isfinite(m):
        return m
    return m + np.log(np.sum(np.exp(a - m)))


def _norm_logpdf(x: float, means: np.ndarray, variances: np.ndarray) -> np.ndarray:
    return -0.5 * (np.log(2.0 * np.pi * variances) + (x - means) ** 2 / variances)


class BOCPD(Algorithm):

    def __init__(self, run_length, prior_mean: float = None, prior_var: float = None,
                 signal_var: float = None, change_length_threshold: int = None):
        self.run_length = run_length
        self.prior_mean = prior_mean
        self.prior_var = prior_var
        self.signal_var = signal_var
        assert isinstance(change_length_threshold, int) or change_length_threshold is None, \
            'Change_length_threshold must be an integer.'
        self.change_length_threshold = change_length_threshold
        self.has_fit = False

    def fit(self, time_series: np.ndarray):
        assert time_series.ndim == 1, 'Time series needs to be an 1D array.'
        assert time_series.shape[0] >= self.run_length, 'The time series is too short to score any points.'
        sliding_window = np.lib.stride_tricks.sliding_window_view(time_series, self.run_length)
        if self.prior_mean is None:
            self.prior_mean = np.median(np.mean(sliding_window, axis=1))
        if self.prior_var is None:
            self.prior_var = np.var(np.mean(sliding_window, axis=1))
        if self.signal_var is None:
            self.signal_var = np.median(np.var(sliding_window, axis=1))
        self.has_fit = True

    def transform(self, time_series: np.ndarray):
        """O(T^2) time like the exact recursion, but O(T) memory: only the
        message vector and each step's normalized posterior head are kept
        (the reference materializes the full (T+1)^2 run-length matrix,
        which is ~0.5 GB for an 8000-sample series — identical outputs,
        asserted in tests)."""
        if not self.has_fit:
            self.fit(time_series)
        model = _GaussianUnknownMean(self.prior_mean, self.prior_var, self.signal_var)
        log_hazard = np.log(1 / self.run_length)
        log_one_minus_hazard = np.log(1 - 1 / self.run_length)
        log_message = np.array([0.0])
        change_length_threshold = (self.change_length_threshold
                                   if self.change_length_threshold is not None
                                   else int(self.run_length * 0.1))
        t_len = time_series.shape[0]
        change_score = np.zeros(t_len)
        for t in range(1, t_len):
            x = time_series[t - 1]
            log_pis = model.log_pred_prob(t, x)
            log_growth_probs = log_pis + log_message + log_one_minus_hazard
            log_cp_prob = _logsumexp(log_pis + log_message + log_hazard)
            new_log_joint = np.append(log_cp_prob, log_growth_probs)
            norm = _logsumexp(new_log_joint)
            head = new_log_joint[:change_length_threshold + 1] - norm
            change_score[t - 1] = np.sum(np.exp(head))
            model.update_params(t, x)
            log_message = new_log_joint
        # the final row of the reference's posterior matrix is never filled
        # by the recursion -> its score entry is exp(-inf) sums == 0
        change_score[t_len - 1] = 0.0
        return change_score

    # -- true online API (the streaming engine's incremental form) ----------
    #
    # BOCPD is inherently online: transform()'s recursion consumes one point
    # per step, so unlike the subspace kernels there is no replay buffer —
    # the posterior state itself streams.  stream_step(state, x) reproduces
    # one loop iteration of transform() exactly (same op order), so emitted
    # scores are BIT-IDENTICAL to the batch run for every position except
    # the batch's artificial trailing zero (the final posterior row the
    # reference never fills).  Priors must be explicit: a stream cannot fit
    # them from the whole series.

    def stream_state(self, max_run_length: int = None):
        """Initial online state: (mean_params, prec_params, log_message, t).
        ``max_run_length`` bounds the run-length support (and therefore the
        state size) — None keeps exact unbounded state; a bound makes state
        O(max_run_length) for billion-point streams at the cost of ignoring
        runs longer than the bound (scores equal the exact recursion until
        t exceeds the bound)."""
        assert self.prior_mean is not None and self.prior_var is not None \
            and self.signal_var is not None, \
            'streaming BOCPD needs explicit priors (prior_mean/prior_var/signal_var)'
        self._max_run_length = max_run_length
        return (np.array([self.prior_mean], dtype=np.float64),
                np.array([1.0 / self.prior_var], dtype=np.float64),
                np.array([0.0]), 1)

    def stream_step(self, state, x: float):
        """Consume one point; returns (score_for_this_point, new_state)."""
        mean_params, prec_params, log_message, t = state
        n_rl = len(mean_params)  # run-length support carried so far
        model = _GaussianUnknownMean(self.prior_mean, self.prior_var, self.signal_var)
        model.mean_params = mean_params
        model.prec_params = prec_params
        log_hazard = np.log(1 / self.run_length)
        log_one_minus_hazard = np.log(1 - 1 / self.run_length)
        threshold = (self.change_length_threshold
                     if self.change_length_threshold is not None
                     else int(self.run_length * 0.1))

        log_pis = model.log_pred_prob(n_rl, x)
        log_growth_probs = log_pis + log_message + log_one_minus_hazard
        log_cp_prob = _logsumexp(log_pis + log_message + log_hazard)
        new_log_joint = np.append(log_cp_prob, log_growth_probs)
        norm = _logsumexp(new_log_joint)
        score = float(np.sum(np.exp(new_log_joint[:threshold + 1] - norm)))
        model.update_params(n_rl, x)
        mean_params, prec_params, log_message = \
            model.mean_params, model.prec_params, new_log_joint
        cap = getattr(self, '_max_run_length', None)
        if cap is not None and len(log_message) > cap:
            mean_params = mean_params[:cap]
            prec_params = prec_params[:cap]
            log_message = log_message[:cap]
        return score, (mean_params, prec_params, log_message, t + 1)


class _GaussianUnknownMean:
    """Conjugate Gaussian with unknown mean (Murphy 2007 eqs. 19/24/40;
    reference bocpd.py:188-227)."""

    def __init__(self, mean0, var0, varx):
        self.mean0 = mean0
        self.var0 = var0
        self.varx = varx
        self.mean_params = np.array([mean0], dtype=np.float64)
        self.prec_params = np.array([1 / var0], dtype=np.float64)

    def log_pred_prob(self, t, x):
        post_means = self.mean_params[:t]
        post_vars = self.var_params[:t]
        return _norm_logpdf(x, post_means, post_vars)

    def update_params(self, t, x):
        new_prec_params = self.prec_params + (1 / self.varx)
        self.prec_params = np.append([1 / self.var0], new_prec_params)
        new_mean_params = (self.mean_params * self.prec_params[:-1] + (x / self.varx)) / new_prec_params
        self.mean_params = np.append([self.mean0], new_mean_params)

    @property
    def var_params(self):
        return 1.0 / self.prec_params + self.varx
