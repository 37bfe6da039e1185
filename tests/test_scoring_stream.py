"""Streaming stateful scoring == batch transform, through real Structured
Streaming micro-batches (the engine's applyInPandasWithState operator,
exactness property per the reference's buffered-replay proof)."""
import glob
import os

import numpy as np
import pandas as pd
import pytest

from changepoynt_spark.kernels.sst import SST
from changepoynt_spark.sources.signals import streaming_sine_signal
from changepoynt_spark.streaming.scoring_stream import streaming_scores

SETTINGS = dict(window_length=20, n_windows=20, lag=6, rank=3,
                method='naive updated', scoring_step=1, scale=False)


@pytest.fixture()
def point_stream_dir(spark, tmp_path):
    """Two series as a point stream, written as several files so the
    streaming query sees multiple micro-batches."""
    sig_a = streaming_sine_signal(seed=7)
    sig_b = streaming_sine_signal(seed=11)
    rows = []
    for doc, sig in (('doc_a', sig_a), ('doc_b', sig_b)):
        for p, v in enumerate(sig):
            rows.append((doc, p, float(v)))
    pdf = pd.DataFrame(rows, columns=['doc_id', 'pos', 'value'])
    out = str(tmp_path / 'points')
    os.makedirs(out)
    # split by position so points arrive over time (in order per file set)
    for i, chunk in enumerate(np.array_split(np.arange(len(sig_a)), 5)):
        part = pdf[pdf['pos'].isin(chunk)]
        spark.createDataFrame(part).coalesce(1).write.parquet(f'{out}/batch={i}')
    return out, {'doc_a': sig_a, 'doc_b': sig_b}


def test_streaming_scores_match_batch_exactly(spark, point_stream_dir):
    out_dir, signals = point_stream_dir
    schema = spark.read.parquet(f'{out_dir}/batch=0').schema
    stream = (spark.readStream.schema(schema)
              .option('maxFilesPerTrigger', 1)
              .parquet(f'{out_dir}/batch=*'))
    scored = streaming_scores(stream, algorithm='sst', params=SETTINGS)
    q = (scored.writeStream.outputMode('append').format('memory')
         .queryName('stream_scores').trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = spark.sql('SELECT * FROM stream_scores').toPandas()
    assert not got.duplicated(['doc_id', 'pos']).any()

    det = SST(**SETTINGS)
    buffer_size = det.covered_regions()[0] + 1
    for doc, sig in signals.items():
        batch_score = SST(**SETTINGS).transform(sig)
        sub = got[got.doc_id == doc].sort_values('pos')
        # every determinable position was emitted exactly once
        first = det.first_score_position
        last = len(sig) - 1 - (buffer_size - 1 - first)
        assert sub['pos'].tolist() == list(range(first, last + 1))
        np.testing.assert_allclose(sub['score'].to_numpy(),
                                   batch_score[first:last + 1],
                                   rtol=1e-10, atol=1e-10)


class _FakeState:
    """Minimal GroupState stand-in for unit-testing the stateful fn."""
    def __init__(self):
        self._v, self.exists = None, False

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v, self.exists = v, True


def test_gap_overflow_advances_and_counts_loss():
    """A gap that outlasts max_pending must NOT wedge the series: the
    operator advances past it, counts the lost span in state, and keeps
    scoring the post-gap region (with a fresh buffer — no window spans the
    gap)."""
    from changepoynt_spark.streaming.scoring_stream import _make_stateful_fn

    params = dict(window_length=4, n_windows=4, lag=2, rank=1,
                  method='naive updated', scale=False)
    fn = _make_stateful_fn('sst', params, max_pending=5)
    sig = streaming_sine_signal(seed=3)[:80]
    state = _FakeState()

    def feed(positions):
        pdf = pd.DataFrame({'pos': positions,
                            'value': [float(sig[p]) for p in positions]})
        return list(fn(('doc_x',), iter([pdf]), state))

    out1 = feed(range(0, 20))              # clean prefix: scores flow
    assert out1 and len(out1[0]) > 0
    # positions 20..24 never arrive; 25..35 overflow the pending budget (5)
    out2 = feed(range(25, 36))
    buf, next_pos, pend_p, pend_v, n_dropped = state.get
    assert n_dropped == 5                  # exactly the lost span [20, 25)
    assert next_pos == 36                  # advanced and drained past the gap
    assert not pend_p                      # nothing left parked
    out3 = feed(range(36, 80))
    post = pd.concat(out2 + out3) if (out2 or out3) else pd.DataFrame(columns=['pos'])
    assert len(post) > 0, 'series wedged after gap overflow'
    # fresh-buffer restart == batch transform of the post-gap segment: no
    # emitted window spans the gap
    algo = SST(**params)
    seg = np.asarray(sig[25:], dtype=np.float64)
    batch = SST(**params).transform(seg)
    first = algo.first_score_position
    checked = 0
    for pos, score in zip(post['pos'], post['score']):
        assert pos >= 25, f'emitted position {pos} inside the lost span'
        if pos >= 25 + first:
            np.testing.assert_allclose(score, batch[pos - 25], rtol=1e-10)
            checked += 1
    assert checked > 10


def test_unblocking_point_on_full_pending_keeps_continuity():
    """When the pending buffer is AT capacity and the missing point finally
    arrives, nothing was lost — the buffer must NOT reset and every score
    must equal the batch transform of the full signal (regression: the
    overflow check used to fire before the drain)."""
    from changepoynt_spark.streaming.scoring_stream import _make_stateful_fn

    params = dict(window_length=4, n_windows=4, lag=2, rank=1,
                  method='naive updated', scale=False)
    fn = _make_stateful_fn('sst', params, max_pending=5)
    sig = streaming_sine_signal(seed=5)[:40]
    state = _FakeState()

    def feed(positions):
        pdf = pd.DataFrame({'pos': positions,
                            'value': [float(sig[p]) for p in positions]})
        return list(fn(('doc_y',), iter([pdf]), state))

    out = []
    out += feed(range(0, 15))
    out += feed([16, 17, 18, 19, 20])   # 15 missing; pending fills to cap (5)
    out += feed([15])                   # the unblocking point: NOT an overflow
    out += feed(range(21, 40))
    buf, next_pos, pend_p, pend_v, n_dropped = state.get
    assert n_dropped == 0
    assert next_pos == 40
    got = pd.concat(out).sort_values('pos')
    batch = SST(**params).transform(np.asarray(sig, dtype=np.float64))
    det = SST(**params)
    first = det.first_score_position
    buffer_size = det.covered_regions()[0] + 1
    last = len(sig) - 1 - (buffer_size - 1 - first)
    assert got['pos'].tolist() == list(range(first, last + 1))  # no holes
    np.testing.assert_allclose(got['score'].to_numpy(),
                               batch[first:last + 1], rtol=1e-10)


def test_streaming_moving_window_matches_batch():
    """The MovingWindow baseline streams too: every emitted score equals the
    batch transform at that position (its score depends only on the
    [p-w, p+w) neighborhood, so a (2w+1)-buffer replay is exact)."""
    from changepoynt_spark.streaming.scoring_stream import _make_stateful_fn
    from changepoynt_spark.kernels.baseline import MovingWindow

    params = {'window_length': 6, 'method': 'meanvar'}
    fn = _make_stateful_fn('moving_window', params)
    sig = streaming_sine_signal(seed=9)[:70]
    state = _FakeState()
    pdf = pd.DataFrame({'pos': range(len(sig)), 'value': sig.astype(float)})
    out = pd.concat(list(fn(('doc_m',), iter([pdf]), state)))
    batch = MovingWindow(**params).transform(np.asarray(sig, dtype=np.float64))
    w = params['window_length']
    assert out['pos'].min() == w                    # first scoreable position
    # fixed-offset replay emits up to len-1-delay (same tail truncation as
    # the reference's buffered-replay protocol)
    assert out['pos'].max() == len(sig) - 1 - w
    for pos, score in zip(out['pos'], out['score']):
        np.testing.assert_allclose(score, batch[pos], rtol=1e-12)


def test_streaming_bocpd_online_matches_batch_exactly(spark, tmp_path):
    """BOCPD's true online form through real micro-batches: the posterior
    state streams (no replay buffer) and every emitted score is
    BIT-IDENTICAL to the batch transform — the reference's buffered-replay
    exactness contract, extended to the one kernel that is inherently
    online."""
    from changepoynt_spark.kernels.bocpd import BOCPD
    from changepoynt_spark.streaming.scoring_stream import streaming_online_scores

    priors = dict(prior_mean=2.0, prior_var=1.5, signal_var=0.8)
    params = dict(run_length=30, **priors)
    sig_a = streaming_sine_signal(seed=7)[:150] + 2.0
    sig_b = np.hstack([streaming_sine_signal(seed=11)[:60],
                       5.0 + streaming_sine_signal(seed=13)[:90]])
    rows = []
    for doc, sig in (('doc_a', sig_a), ('doc_b', sig_b)):
        for p, v in enumerate(sig):
            rows.append((doc, p, float(v)))
    pdf = pd.DataFrame(rows, columns=['doc_id', 'pos', 'value'])
    out = str(tmp_path / 'points')
    os.makedirs(out)
    for i, chunk in enumerate(np.array_split(np.arange(len(sig_a)), 4)):
        part = pdf[pdf['pos'].isin(chunk)]
        spark.createDataFrame(part).coalesce(1).write.parquet(f'{out}/batch={i}')

    schema = spark.read.parquet(f'{out}/batch=0').schema
    stream = (spark.readStream.schema(schema)
              .option('maxFilesPerTrigger', 1).parquet(f'{out}/batch=*'))
    scored = streaming_online_scores(stream, algorithm='bocpd', params=params)
    q = (scored.writeStream.outputMode('append').format('memory')
         .queryName('bocpd_stream').trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = spark.sql('SELECT * FROM bocpd_stream').toPandas()
    assert not got.duplicated(['doc_id', 'pos']).any()

    for doc, sig in (('doc_a', sig_a), ('doc_b', sig_b)):
        batch = BOCPD(**params).transform(np.asarray(sig, dtype=np.float64))
        sub = got[got.doc_id == doc].sort_values('pos')
        # every position emitted exactly once, as soon as consumed
        assert sub['pos'].tolist() == list(range(len(sig)))
        # bit-identical except the batch's artificial trailing zero (the
        # reference never fills the final posterior row)
        assert np.array_equal(sub['score'].to_numpy()[:-1], batch[:-1])


def test_bocpd_online_pruning_error_bounded_by_tail_mass():
    """max_run_length caps the state for unbounded streams; the score error
    is bounded by the truncated run-length tail mass (1 - hazard)^cap."""
    from changepoynt_spark.kernels.bocpd import BOCPD

    np.random.seed(3455)
    n = 200
    sig = np.hstack([1 + np.random.rand(n), 3 + 2 * np.random.rand(n)])
    priors = dict(prior_mean=2.0, prior_var=1.5, signal_var=0.8)

    def run(cap):
        det = BOCPD(run_length=50, **priors)
        st = det.stream_state(max_run_length=cap)
        out = []
        for x in sig:
            s, st = det.stream_step(st, float(x))
            out.append(s)
        return np.asarray(out)

    exact = run(None)
    batch = BOCPD(run_length=50, **priors).transform(sig)
    assert np.array_equal(exact[:-1], batch[:-1])
    for cap in (120, 250):
        err = np.max(np.abs(run(cap) - exact))
        bound = 2 * (1 - 1 / 50) ** cap
        assert err < bound, (cap, err, bound)
        # and the cap really bounds the state
        det = BOCPD(run_length=50, **priors)
        st = det.stream_state(max_run_length=cap)
        for x in sig:
            _, st = det.stream_step(st, float(x))
        assert len(st[0]) <= cap


def test_bocpd_online_gap_advance_resets_posterior():
    """The online path shares the gap-advance contract: a gap outlasting
    max_pending is counted, the posterior RESTARTS at the earliest parked
    point (a posterior must never span missing data), and post-gap scores
    equal a fresh batch transform of the post-gap segment."""
    from changepoynt_spark.kernels.bocpd import BOCPD
    from changepoynt_spark.streaming.scoring_stream import _make_online_fn

    priors = dict(prior_mean=2.0, prior_var=1.5, signal_var=0.8)
    params = dict(run_length=20, **priors)
    fn = _make_online_fn('bocpd', params, max_pending=5)
    sig = streaming_sine_signal(seed=9)[:80] + 2.0
    state = _FakeState()

    def feed(positions):
        pdf = pd.DataFrame({'pos': positions,
                            'value': [float(sig[p]) for p in positions]})
        return list(fn(('doc_z',), iter([pdf]), state))

    feed(range(0, 20))
    out2 = feed(range(25, 36))            # 20..24 never arrive -> overflow
    st = state.get
    n_dropped, next_pos, pend = st[7], st[4], st[5]
    assert n_dropped == 5 and next_pos == 36 and not pend
    out3 = feed(range(36, 80))
    post = pd.concat(out2 + out3).sort_values('pos')
    assert post['pos'].tolist() == list(range(25, 80))
    batch = BOCPD(**params).transform(np.asarray(sig[25:], dtype=np.float64))
    np.testing.assert_array_equal(post['score'].to_numpy()[:-1], batch[:-1])
