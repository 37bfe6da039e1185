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
