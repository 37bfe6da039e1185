"""Entropy Singular Spectrum Transformation (numpy oracle).

Re-derives the semantics of the reference ESST
(/root/reference/changepoynt/algorithms/esst.py:12-251; Boelter, Weber et al.,
IAS-19 2025): a single concatenated trajectory matrix [H_past | H_future] is
decomposed with a randomized SVD; the right singular vectors are shifted and
normalized into pseudo-distributions and the score is the eigenvalue-weighted
absolute left/right mean difference.

Offset differs from SST: ``compute_offset = n_windows + lag``
(reference esst.py:118-119) vs SST's ``n_windows//2 + lag``.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import numpy as np

from changepoynt_spark.kernels import linalg as lg
from changepoynt_spark.kernels import normalization
from changepoynt_spark.kernels.base import SingularSubspaceAlgorithm


class ESST(SingularSubspaceAlgorithm):

    def __init__(self, window_length: int, n_windows: int = None, lag: int = None, rank: int = 5,
                 scale: bool = True, method: str = 'fbrsvd', random_rank: int = None,
                 scoring_step: int = 1, use_fast_hankel: bool = False,
                 mitigate_offset: bool = False) -> None:
        self.window_length = window_length
        self.n_windows = n_windows
        self.rank = rank
        self.scale = scale
        self.random_rank = random_rank
        self.lag = lag
        self.scoring_step = scoring_step
        self.use_fast_hankel = use_fast_hankel
        self.method = method
        self.mitigate_offset = mitigate_offset

        # defaults — reference esst.py:77-86
        if self.n_windows is None:
            self.n_windows = self.window_length // 2
        if self.lag is None:
            self.lag = self.n_windows
        if self.random_rank is None:
            self.random_rank = min(self.rank + 10, self.window_length, self.n_windows)

        self.methods = {
            'rsvd': partial(left_entropy, rank=self.rank, random_rank=self.random_rank,
                            method='rsvd'),
            'fbrsvd': partial(left_entropy, rank=self.rank, random_rank=self.random_rank,
                              method='fbrsvd'),
        }
        if self.method not in self.methods:
            raise ValueError(f'Method {self.method} not defined. '
                             f'Possible methods: {list(self.methods.keys())}.')
        if use_fast_hankel and self.method == 'fbrsvd':
            raise ValueError('fbrsvd method is not defined with use_fast_hankel=True')
        self.hankel_construction = {False: lg.compile_hankel, True: lg.FastHankel}
        if self.use_fast_hankel and self.mitigate_offset:
            raise ValueError(
                f'use_fast_hankel={self.use_fast_hankel} is not allowed when '
                f'mitigate_offset={self.mitigate_offset}. You can only use one or none of them.')

    def compute_offset(self) -> int:
        return self.n_windows + self.lag

    def transform(self, time_series: np.ndarray) -> np.ndarray:
        assert time_series.ndim == 1, 'Time series needs to be an 1D array.'
        assert time_series.shape[0] > self.window_length, \
            'Time series needs to be longer than window length.'
        starting_point = self.covered_regions()[0]
        assert starting_point < time_series.shape[0], 'The time series is too short to score any points.'
        if self.scale:
            time_series = normalization.min_max_scaling(time_series, min_val=1.0, max_val=2.0,
                                                        inplace=False)
        else:
            time_series = time_series.copy()
        if not self.use_fast_hankel:
            # batched execution: ESST has no cross-step feedback — after
            # replaying the per-step sketch draws, the concatenated-Hankel
            # randomized SVDs and the entropy math vectorize across steps
            return _transform_batched(
                time_series=time_series, start_idx=starting_point,
                offset=self.compute_offset(), window_length=self.window_length,
                n_windows=self.n_windows, lag=self.lag, scoring_step=self.scoring_step,
                rank=self.rank, random_rank=self.random_rank, method=self.method,
                mitigate_offset=self.mitigate_offset)
        scoring_function = self.methods[self.method]
        hankel_function = self.hankel_construction[self.use_fast_hankel]
        return _transform(time_series=time_series, start_idx=starting_point,
                          offset=self.compute_offset(), window_length=self.window_length,
                          n_windows=self.n_windows, lag=self.lag, scoring_step=self.scoring_step,
                          scoring_function=scoring_function,
                          hankel_construction_function=hankel_function,
                          mitigate_offset=self.mitigate_offset)


def _transform(time_series: np.ndarray, start_idx: int, offset: int, window_length: int,
               n_windows: int, lag: int, scoring_step: int, scoring_function: Callable,
               hankel_construction_function: Callable, mitigate_offset: bool = False) -> np.ndarray:
    """Concatenated-Hankel scoring loop (reference esst.py:156-189)."""
    score = np.zeros_like(time_series)
    fast = hankel_construction_function is lg.FastHankel
    for idx in range(start_idx, time_series.shape[0], scoring_step):
        hankel_past = hankel_construction_function(time_series, idx - lag, window_length, n_windows)
        if mitigate_offset:
            hankel_past = hankel_past - hankel_past.mean(axis=0) + 1
        hankel_future = hankel_construction_function(time_series, idx, window_length, n_windows)
        if mitigate_offset:
            hankel_future = hankel_future - hankel_future.mean(axis=0) + 1
        if fast:
            concatenated = lg.ConcatHankel(hankel_past, hankel_future)
        else:
            concatenated = np.concatenate((hankel_past, hankel_future), axis=1)
        score[idx - offset - scoring_step // 2:idx - offset + (scoring_step + 1) // 2] = \
            scoring_function(concatenated)
    return score


def _transform_batched(time_series: np.ndarray, start_idx: int, offset: int,
                       window_length: int, n_windows: int, lag: int, scoring_step: int,
                       rank: int, random_rank: int, method: str, mitigate_offset: bool,
                       hankel_builder=None, row_dim: int = None) -> np.ndarray:
    """Step-batched ESST over dense concatenated Hankels.  Same per-step
    math as left_entropy; RNG stream parity: one uniform sketch draw per
    step, replayed in order first.  ``hankel_builder``/``row_dim`` plug in
    block-Hankel stacks for MESST."""
    from changepoynt_spark.kernels.sst import _batched_hankels

    w, n = window_length, n_windows
    rd = row_dim or w
    build = hankel_builder or (lambda ends_: _batched_hankels(
        time_series, ends_, w, n, mitigate_offset))
    oversampling = 2 if method == 'fbrsvd' else random_rank - rank
    l = rank + oversampling
    assert 1.25 * l < min(rd, 2 * n)
    t_len = time_series.shape[0]
    score = np.zeros(t_len)
    ends = np.arange(start_idx, t_len, scoring_step)
    b = ends.size
    if b == 0:
        return score
    omegas = np.empty((b, 2 * n, l))
    for i in range(b):
        omegas[i] = np.random.uniform(low=-1, high=1, size=(2 * n, l))

    chunk = max(16, int(3e6 / (rd * rd)))
    scores = np.empty(b)
    for c0 in range(0, b, chunk):
        sl = slice(c0, min(b, c0 + chunk))
        h_past = build(ends[sl] - lag)
        h_fut = build(ends[sl])
        concat = np.concatenate((h_past, h_fut), axis=2)
        del h_past, h_fut
        _, eigenvalues, va = lg.batched_randomized_hankel_svd(concat, rank, omegas[sl])
        del concat
        va = va - np.min(va, axis=2, keepdims=True) + 1
        va = va / np.sum(va, axis=2, keepdims=True)
        half = va.shape[2] // 2
        skew = np.abs(np.mean(va[:, :, :half] - va[:, :, half:], axis=2))
        scores[sl] = np.einsum('bk,bk->b', eigenvalues, skew) / np.sum(eigenvalues, axis=1)
    for i, e in enumerate(ends):
        score[e - offset - scoring_step // 2:e - offset + (scoring_step + 1) // 2] = scores[i]
    return score


def left_right_diff(left_eigenvectors: np.ndarray) -> np.ndarray:
    """Mean difference between the left and right halves of each right
    singular vector (reference esst.py:210-212)."""
    n = left_eigenvectors.shape[1] // 2
    return np.mean(left_eigenvectors[:, :n] - left_eigenvectors[:, n:], axis=1)


def left_entropy(hankel, rank: int, random_rank: int, method: str) -> float:
    """ESST score of a concatenated trajectory matrix (reference
    esst.py:215-251).  Despite the variable naming inherited from the
    reference, ``left_eigenvectors`` are the *right* singular vectors Va."""
    if method == 'fbrsvd':
        # fbpca is absent in this environment; back the fbrsvd flavour with
        # the same Halko rSVD at fbpca's default oversampling (l = k + 2).
        right_eigenvectors, eigenvalues, left_eigenvectors = lg.randomized_hankel_svd(
            hankel, rank, oversampling_p=2)
    elif method == 'rsvd':
        right_eigenvectors, eigenvalues, left_eigenvectors = lg.randomized_hankel_svd(
            hankel, rank, oversampling_p=random_rank - rank)
    else:
        raise NotImplementedError(f'Method {method} is not available.')
    left_eigenvectors = left_eigenvectors - np.min(left_eigenvectors, axis=1)[:, None] + 1
    left_eigenvectors = left_eigenvectors / np.sum(left_eigenvectors, axis=1)[:, None]
    skew = np.abs(left_right_diff(left_eigenvectors))
    weighted_entropy = (eigenvalues @ skew) / np.sum(eigenvalues)
    return weighted_entropy
