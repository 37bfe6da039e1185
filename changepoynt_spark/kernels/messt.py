"""Multivariate ESST (numpy oracle).

Semantics of the reference MESST
(/root/reference/changepoynt/algorithms/messt.py:12-160): per-channel
min-max scaling, concatenated block-Hankel [H_past | H_future] scored with
esst.left_entropy; offset = n_windows + lag.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import numpy as np

from changepoynt_spark.kernels import normalization
from changepoynt_spark.kernels.base import SingularSubspaceAlgorithm
from changepoynt_spark.kernels.block import BlockFastHankel, compile_block_hankel
from changepoynt_spark.kernels.esst import left_entropy
from changepoynt_spark.kernels.linalg import ConcatHankel


class MESST(SingularSubspaceAlgorithm):

    def __init__(self, window_length: int, n_windows: int = None, lag: int = None, rank: int = 5,
                 scale: bool = True, method: str = 'rsvd', random_rank: int = None,
                 scoring_step: int = 1, use_fast_hankel: bool = False) -> None:
        self.window_length = window_length
        self.n_windows = n_windows
        self.rank = rank
        self.scale = scale
        self.random_rank = random_rank
        self.lag = lag
        self.scoring_step = scoring_step
        self.use_fast_hankel = use_fast_hankel
        self.method = method

        if self.n_windows is None:
            self.n_windows = self.window_length // 2
        if self.lag is None:
            self.lag = self.n_windows
        if self.random_rank is None:
            self.random_rank = min(self.rank + 10, self.window_length, self.n_windows)

        self.methods = {'rsvd': partial(left_entropy, rank=self.rank,
                                        random_rank=self.random_rank, method=self.method)}
        if self.method not in self.methods:
            raise ValueError(f'Method {self.method} not defined. '
                             f'Possible methods: {list(self.methods.keys())}.')
        if use_fast_hankel and self.method != 'rsvd':
            raise ValueError(f'method {self.method} is not defined with use_fast_hankel=True')

    def compute_offset(self) -> int:
        return self.n_windows + self.lag

    def transform(self, time_series: np.ndarray) -> np.ndarray:
        assert time_series.ndim > 1, 'Time series needs to be an N-D array. Currently it is 1-D.'
        starting_point = self.covered_regions()[0]
        assert starting_point < time_series.shape[0], 'The time series is too short to score any points.'
        time_series = time_series.astype(np.float64, copy=True)
        if self.scale:
            for idx in range(time_series.shape[1]):
                time_series[:, idx] = normalization.min_max_scaling(time_series[:, idx], 1, 2,
                                                                    inplace=True)
        if not self.use_fast_hankel:
            # step-batched over dense block-Hankel stacks
            from changepoynt_spark.kernels.block import batched_block_hankels
            from changepoynt_spark.kernels.esst import _transform_batched
            c = time_series.shape[1]
            builder = lambda ends: batched_block_hankels(time_series, ends,
                                                         self.window_length, self.n_windows)
            return _transform_batched(
                time_series=time_series[:, 0], start_idx=starting_point,
                offset=self.compute_offset(), window_length=self.window_length,
                n_windows=self.n_windows, lag=self.lag, scoring_step=self.scoring_step,
                rank=self.rank, random_rank=self.random_rank, method=self.method,
                mitigate_offset=False, hankel_builder=builder,
                row_dim=self.window_length * c)
        scoring_function = self.methods[self.method]
        return _transform(time_series=time_series, start_idx=starting_point,
                          offset=self.compute_offset(), window_length=self.window_length,
                          n_windows=self.n_windows, lag=self.lag,
                          scoring_step=self.scoring_step, scoring_function=scoring_function,
                          use_fast_hankel=self.use_fast_hankel)


def _transform(time_series: np.ndarray, start_idx: int, offset: int, window_length: int,
               n_windows: int, lag: int, scoring_step: int, scoring_function: Callable,
               use_fast_hankel: bool) -> np.ndarray:
    score = np.zeros((time_series.shape[0],))
    for idx in range(start_idx, time_series.shape[0], scoring_step):
        if use_fast_hankel:
            hankel_past = BlockFastHankel(time_series, idx - lag, window_length, n_windows)
            hankel_future = BlockFastHankel(time_series, idx, window_length, n_windows)
            concatenated = ConcatHankel(hankel_past, hankel_future)
        else:
            hankel_past = compile_block_hankel(time_series, idx - lag, window_length, n_windows)
            hankel_future = compile_block_hankel(time_series, idx, window_length, n_windows)
            concatenated = np.concatenate((hankel_past, hankel_future), axis=1)
        score[idx - offset - scoring_step // 2:idx - offset + (scoring_step + 1) // 2] = \
            scoring_function(concatenated)
    return score
