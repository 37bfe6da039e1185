"""Spark == oracle bit-equality for the scoring operator, plus the
input_hint invariants: token-array byte equality and no-shuffle plan."""
import numpy as np
import pytest

from changepoynt_spark.operators import scoring
from changepoynt_spark.sources import datagen


@pytest.fixture(scope='module')
def small_tokens(spark):
    df = datagen.tokens_table(spark, n_docs=12, seed=42, max_len=1200, partitions=4)
    df.cache().count()
    return df


def _oracle_scores(pdf, algorithm, params, dequantize=True):
    out = {}
    for _, row in pdf.iterrows():
        ts = np.asarray(row['tokens'], dtype=np.float64)
        if dequantize:
            ts = ts / datagen.QUANT_SCALE
        if len(ts) < scoring.min_required_length(algorithm, params):
            continue
        np.random.seed(scoring.series_seed(row['doc_id']))
        algo = scoring.build_algorithm(algorithm, params)
        out[row['doc_id']] = algo.transform(ts)
    return out


@pytest.mark.parametrize('algorithm,params', [
    ('sst', {'window_length': 30, 'rank': 2, 'method': 'ika', 'scoring_step': 4}),
    ('sst', {'window_length': 30, 'rank': 2, 'method': 'naive', 'scoring_step': 8}),
    ('sst', {'window_length': 40, 'rank': 2, 'method': 'rsvd', 'use_fast_hankel': True,
             'scoring_step': 8}),
    ('esst', {'window_length': 30, 'rank': 2, 'method': 'rsvd', 'scoring_step': 8}),
    ('moving_window', {'window_length': 50}),
    ('zero', {}),
    ('fluss', {'window_length': 25}),
])
def test_spark_scores_bitmatch_oracle(spark, small_tokens, algorithm, params):
    scored = scoring.score_series(small_tokens, algorithm=algorithm, params=params)
    rows = scored.select('doc_id', 'tokens', 'score').collect()
    assert rows, 'no rows survived the length filter'
    pdf = small_tokens.toPandas()
    oracle = _oracle_scores(pdf, algorithm, params)
    assert set(r['doc_id'] for r in rows) == set(oracle)
    for r in rows:
        got = np.asarray(r['score'], dtype=np.float64)
        expected = oracle[r['doc_id']]
        assert np.array_equal(got, expected), f'{algorithm}: score mismatch for {r["doc_id"]}'


def test_bocpd_bitmatch_on_golden_carrier(spark, small_tokens):
    params = {'run_length': 200}
    df = small_tokens.filter("doc_id = 'golden_step3x300'")
    scored = scoring.score_series(df, algorithm='bocpd', params=params)
    row = scored.select('doc_id', 'score').collect()[0]
    pdf = df.toPandas()
    oracle = _oracle_scores(pdf, 'bocpd', params)
    assert np.array_equal(np.asarray(row['score']), oracle['golden_step3x300'])


def test_token_passthrough_byte_identical(spark, small_tokens):
    scored = scoring.score_series(small_tokens, algorithm='zero')
    out = {r['doc_id']: np.asarray(r['tokens'], dtype=np.int32)
           for r in scored.select('doc_id', 'tokens').collect()}
    orig = {r['doc_id']: np.asarray(r['tokens'], dtype=np.int32)
            for r in small_tokens.select('doc_id', 'tokens').collect()}
    assert set(out) == set(orig)
    for k in orig:
        assert out[k].tobytes() == orig[k].tobytes()


def test_scoring_plan_has_no_shuffle(spark):
    """mapInPandas must not introduce an exchange: scoring runs on the scan
    partitions directly (the fixture's explicit repartition is excluded)."""
    df = datagen.tokens_table(spark, n_docs=8, seed=3, max_len=900)
    scored = scoring.score_series(df, algorithm='zero')
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert 'Exchange' not in plan, plan


def test_short_series_filter_pushed_below_udf(spark):
    df = datagen.tokens_table(spark, n_docs=5, seed=1, max_len=900, include_golden=False)
    params = {'window_length': 300, 'n_windows': 300, 'lag': 100}
    min_len = scoring.min_required_length('sst', params)
    assert min_len == 300 + 300 - 1 + 100 + 1
    scored = scoring.score_series(df, algorithm='sst', params=params)
    assert scored.count() == df.filter(f'n_tok >= {min_len}').count()


def test_unknown_algorithm_raises(spark, small_tokens):
    with pytest.raises(ValueError):
        scoring.score_series(small_tokens, algorithm='nope')


def test_explode_scores_long_format(spark, small_tokens):
    scored = scoring.score_series(small_tokens, algorithm='moving_window',
                                  params={'window_length': 50})
    long = scoring.explode_scores(scored)
    assert long.columns == ['doc_id', 'source', 'pos', 'score']
    one = scored.select('doc_id', 'score').first()
    n = long.filter(long.doc_id == one['doc_id']).count()
    assert n == len(one['score'])


def test_rulsif_spark_bitmatch_oracle(spark, small_tokens):
    """RuLSIF on Spark == driver-side numpy oracle, bit-for-bit (closes the
    round-1 seam: RuLSIF had kernel tests but no Spark-side equality)."""
    params = {'window_length': 4, 'n_windows': 8, 'scoring_step': 8}
    df = small_tokens.filter("n_tok <= 600")  # keep the O(steps * CV) cost down
    scored = scoring.score_series(df, algorithm='rulsif', params=params)
    rows = scored.select('doc_id', 'score').collect()
    assert rows
    oracle = _oracle_scores(df.toPandas(), 'rulsif', params)
    assert set(r['doc_id'] for r in rows) == set(oracle)
    for r in rows:
        assert np.array_equal(np.asarray(r['score']), oracle[r['doc_id']]), r['doc_id']


def test_kliep_spark_bitmatch_oracle(spark, small_tokens):
    """KLIEP on Spark == driver-side numpy oracle, bit-for-bit (same contract
    as every other kernel; KLIEP is net-new vs the reference, which lists it
    as Planned)."""
    params = {'window_length': 4, 'n_windows': 8, 'scoring_step': 8,
              'estimation_lag': 4}
    df = small_tokens.filter("n_tok <= 600")
    scored = scoring.score_series(df, algorithm='kliep', params=params)
    rows = scored.select('doc_id', 'score').collect()
    assert rows
    oracle = _oracle_scores(df.toPandas(), 'kliep', params)
    assert set(r['doc_id'] for r in rows) == set(oracle)
    for r in rows:
        assert np.array_equal(np.asarray(r['score']), oracle[r['doc_id']]), r['doc_id']


@pytest.mark.parametrize('algorithm,params', [
    ('msst', {'window_length': 12, 'n_windows': 12, 'lag': 4, 'rank': 2,
              'method': 'ika'}),
    ('messt', {'window_length': 12, 'n_windows': 6, 'lag': 6, 'rank': 2,
               'method': 'rsvd'}),
])
def test_multichannel_spark_bitmatch_oracle(spark, small_tokens, algorithm, params):
    """score_multichannel_series (MSST/MESST entry) == numpy oracle on the
    same two-channel construction the driver query uses."""
    from pyspark.sql import functions as F
    df = small_tokens.filter('n_tok >= 40').select(
        'doc_id', 'source', 'n_tok',
        F.array(F.transform('tokens', lambda t: t.cast('double')),
                F.transform(F.reverse('tokens'), lambda t: t.cast('double'))
                ).alias('channels'))
    scored = scoring.score_multichannel_series(df, algorithm=algorithm, params=params)
    rows = scored.select('doc_id', 'score').collect()
    assert rows
    pdf = small_tokens.filter('n_tok >= 40').toPandas()
    for r in rows:
        toks = np.asarray(
            pdf.loc[pdf.doc_id == r['doc_id'], 'tokens'].iloc[0], dtype=np.float64)
        mat = np.stack([toks, toks[::-1]], axis=1)
        np.random.seed(scoring.series_seed(r['doc_id']))
        algo = scoring.MULTIVARIATE_ALGORITHMS[algorithm](**params)
        expected = algo.transform(mat)
        assert np.array_equal(np.asarray(r['score']), expected), r['doc_id']
