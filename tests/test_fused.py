"""Fused in-kernel rollup must be value-identical to the generic cascade,
and its compressed blocks must round-trip to the tier rows."""
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from changepoynt_spark.codecs import decode_timestamps, decode_values
from changepoynt_spark.operators import fused, rollup
from changepoynt_spark.operators.scoring import explode_scores, score_series
from changepoynt_spark.sources import datagen

PARAMS = {'window_length': 20, 'n_windows': 20, 'lag': 6, 'rank': 2, 'method': 'ika',
          'scoring_step': 2}


@pytest.fixture(scope='module')
def tokens(spark):
    df = datagen.tokens_table(spark, n_docs=8, seed=21, max_len=9000, include_golden=False)
    df.cache().count()
    return df


def test_fused_rows_match_generic_cascade(spark, tokens):
    fused_rows = fused.score_rollup(tokens, algorithm='sst', params=PARAMS, output='rows')
    got = fused_rows.toPandas()

    scored = score_series(tokens, algorithm='sst', params=PARAMS)
    long = rollup.attach_timestamps(explode_scores(scored)).withColumnRenamed('score', 'value')
    tiers = rollup.rollup_cascade(long, keys=['doc_id'], ts_col='ts', value_col='value')
    for tier in ('1m', '1h', '1d'):
        exp = tiers[tier].toPandas().sort_values(['doc_id', 'bucket_start']).reset_index(drop=True)
        sub = (got[got.tier == tier].drop(columns=['tier', 'source'])
               .sort_values(['doc_id', 'bucket_start']).reset_index(drop=True))
        assert len(sub) == len(exp), tier
        assert (sub['doc_id'] == exp['doc_id']).all()
        np.testing.assert_array_equal(sub['bucket_start'].to_numpy(),
                                      exp['bucket_start'].to_numpy(), err_msg=tier)
        np.testing.assert_array_equal(sub['cnt_points'].to_numpy(),
                                      exp['cnt_points'].to_numpy(), err_msg=tier)
        for col in ('sum_value', 'min_value', 'max_value', 'avg_value',
                    'first_value', 'last_value'):
            np.testing.assert_allclose(sub[col].to_numpy(), exp[col].to_numpy(),
                                       rtol=1e-12, err_msg=f'{tier}.{col}')


def test_fused_blocks_roundtrip_to_rows(spark, tokens):
    rows = fused.score_rollup(tokens, algorithm='sst', params=PARAMS, output='rows') \
                .toPandas()
    blocks = fused.score_rollup(tokens, algorithm='sst', params=PARAMS, output='blocks') \
                  .toPandas()
    for (doc, tier), sub in rows.groupby(['doc_id', 'tier']):
        sub = sub.sort_values('bucket_start')
        blks = blocks[(blocks.doc_id == doc) & (blocks.tier == tier)].sort_values('block_start')
        ts = np.concatenate([decode_timestamps(b) for b in blks['ts_blob']])
        vals = np.concatenate([decode_values(b) for b in blks['value_blob']])
        assert int(blks['n_points'].sum()) == len(sub)
        np.testing.assert_array_equal(
            ts, sub['bucket_start'].astype('datetime64[us]').to_numpy().view(np.int64))
        assert (vals.view(np.uint64)
                == sub['avg_value'].to_numpy().view(np.uint64)).all()


def test_fused_plan_has_no_shuffle(spark, tokens):
    out = fused.score_rollup(tokens, algorithm='sst', params=PARAMS, output='blocks')
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert 'Exchange' not in plan, plan
