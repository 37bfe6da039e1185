"""Buffered-streaming exact-replay property: replaying a rolling buffer of
total_region+1 samples through the batch transform reproduces the direct
batch score exactly for the deterministic 'naive updated' method
(reference examples/buffered_streaming_comparison.py:11-75 and
docs/guides/experimental-buffered-streaming.md)."""
from collections import deque

import numpy as np

from changepoynt_spark.kernels.sst import SST
from tests.fixtures import streaming_sine_signal


def transform_buffered(detector, samples):
    if detector.scoring_step != 1:
        raise ValueError('Buffered replay requires scoring_step=1.')
    total_region, _ = detector.covered_regions()
    buffer_size = total_region + 1
    score_position = detector.first_score_position
    delay = buffer_size - 1 - score_position
    output = np.full(samples.shape[0], np.nan, dtype=float)
    buffer = deque(maxlen=buffer_size)
    for current_index, sample in enumerate(samples):
        buffer.append(sample)
        if len(buffer) < buffer_size:
            continue
        buffer_score = detector.transform(np.asarray(buffer))
        output[current_index - delay] = buffer_score[score_position]
    return output


def test_buffered_replay_equals_batch_for_naive_updated():
    signal = streaming_sine_signal(seed=7)
    settings = dict(window_length=20, n_windows=20, lag=6, rank=3,
                    method='naive updated', scoring_step=1, scale=False)
    direct = SST(**settings).transform(signal)
    streamed = transform_buffered(SST(**settings), signal)
    valid = np.isfinite(streamed)
    assert valid.sum() > 200
    np.testing.assert_allclose(streamed[valid], direct[valid], rtol=1e-10, atol=1e-10)
