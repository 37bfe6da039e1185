"""Algorithm base classes: region geometry + runtime model (numpy oracle).

Semantics of /root/reference/changepoynt/algorithms/base_algorithm.py:10-126.
The linear runtime model doubles as the engine's per-series cost model: cost
is proportional to n_tok, which drives salting/chunking decisions in the
Spark planning layer (changepoynt_spark.plans).
"""
from __future__ import annotations

import time
from abc import ABC, abstractmethod

import numpy as np


class Algorithm(ABC):

    @abstractmethod
    def transform(self, time_series: np.ndarray):
        raise NotImplementedError


class SingularSubspaceAlgorithm(Algorithm):
    window_length: int
    n_windows: int
    lag: int
    scoring_step: int

    def covered_regions(self) -> tuple:
        """(total_region, matrix_region) — reference base_algorithm.py:25-50.
        total_region is the minimum series length to score any point; the
        Spark layer pushes ``n_tok > total_region`` below the UDF."""
        matrix_region = self.window_length + self.n_windows - 1
        total_region = matrix_region + self.lag
        return total_region, matrix_region

    @property
    def first_score_position(self):
        """First nonzero score index (reference base_algorithm.py:116-118);
        the zero prefix before it is part of the golden contract."""
        return self.covered_regions()[0] - self.compute_offset() - self.scoring_step // 2

    @abstractmethod
    def compute_offset(self) -> int:
        raise NotImplementedError

    def estimate_runtime(self, signal: np.ndarray, steps: int = 30, verbose: bool = False):
        """Linear runtime extrapolation from one minimal scoring step
        (reference base_algorithm.py:52-114)."""
        total_covered_region = self.covered_regions()[0]
        processing_steps = (signal.shape[0] - total_covered_region) // self.scoring_step
        if total_covered_region > signal.shape[0]:
            raise ValueError(
                f'Test signal for runtime estimation is not long enough: '
                f'{signal.shape=} < {total_covered_region}')
        if signal.ndim == 2:
            shortened = signal[:total_covered_region + 1, :].copy()
        elif signal.ndim == 1:
            shortened = signal[:total_covered_region + 1].copy()
        else:
            raise ValueError(f'Test signal for runtime estimation has weird shape {signal.shape=}.')
        self.transform(shortened)  # warm caches
        times = np.zeros(steps)
        for idx in range(steps):
            start = time.perf_counter()
            self.transform(shortened)
            times[idx] = time.perf_counter() - start
        timer = float(np.mean(times)) * processing_steps
        std = float(np.std(times)) * processing_steps
        if verbose:
            print(f'For {signal.shape=} the runtime will be around {timer:.3f} s (+/- {std:.3f} s).')
        return timer, std
