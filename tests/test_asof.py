"""As-of join: parity with pandas merge_asof (the de-facto reference
semantics) across directions and tolerance, plus shape/edge checks."""
import numpy as np
import pandas as pd
import pytest

from changepoynt_spark.operators.asof import asof_join


@pytest.fixture(scope='module')
def frames():
    rng = np.random.default_rng(3)
    base = pd.Timestamp('2026-01-01')
    left = pd.DataFrame({
        'sym': rng.choice(['A', 'B', 'C'], 80),
        'ts': base + pd.to_timedelta(np.sort(rng.integers(0, 10_000, 80)), unit='s'),
        'qty': rng.integers(1, 100, 80).astype('int64'),
    })
    right = pd.DataFrame({
        'sym': rng.choice(['A', 'B'], 40),   # C never matches -> null columns
        'ts': base + pd.to_timedelta(np.sort(rng.integers(0, 10_000, 40)), unit='s'),
        'px': np.round(rng.uniform(10, 20, 40), 4),
    }).drop_duplicates(['sym', 'ts'])
    return left, right


def _expected(left, right, **kw):
    exp = pd.merge_asof(left.sort_values('ts'), right.sort_values('ts'),
                        on='ts', by='sym', **kw).rename(columns={'px': 'px_r'})
    return exp.sort_values(['sym', 'ts', 'qty']).reset_index(drop=True)


@pytest.mark.parametrize('direction', ['backward', 'forward'])
def test_asof_matches_pandas(spark, frames, direction):
    left, right = frames
    got = (asof_join(spark.createDataFrame(left), spark.createDataFrame(right),
                     on=['sym'], ts_col='ts', right_cols=['px'], direction=direction)
           .toPandas().sort_values(['sym', 'ts', 'qty']).reset_index(drop=True))
    exp = _expected(left, right, direction=direction)
    pd.testing.assert_series_equal(got['px_r'], exp['px_r'], check_names=False)
    assert len(got) == len(left)           # left join: every left row kept
    assert got[got.sym == 'C']['px_r'].isna().all()


def test_asof_tolerance_matches_pandas(spark, frames):
    left, right = frames
    got = (asof_join(spark.createDataFrame(left), spark.createDataFrame(right),
                     on=['sym'], ts_col='ts', right_cols=['px'],
                     tolerance_seconds=300)
           .toPandas().sort_values(['sym', 'ts', 'qty']).reset_index(drop=True))
    exp = _expected(left, right, direction='backward',
                    tolerance=pd.Timedelta(seconds=300))
    pd.testing.assert_series_equal(got['px_r'], exp['px_r'], check_names=False)
    # tolerance nulls the matched timestamp too
    assert got.loc[got['px_r'].isna(), 'ts_r'].isna().all()


def test_asof_tie_takes_right_row_at_equal_ts(spark):
    base = pd.Timestamp('2026-01-01')
    left = pd.DataFrame({'k': ['x'], 'ts': [base], 'v': [1]})
    right = pd.DataFrame({'k': ['x'], 'ts': [base], 'px': [9.5]})
    got = asof_join(spark.createDataFrame(left), spark.createDataFrame(right),
                    on=['k'], ts_col='ts', right_cols=['px']).collect()
    assert got[0]['px_r'] == 9.5           # at-or-before includes equality


def test_asof_single_shuffle_no_range_join(spark, frames):
    """The plan must be the union + running-window shape: key-hash exchanges
    only (no broadcast-nested-loop / cartesian range join)."""
    left, right = frames
    out = asof_join(spark.createDataFrame(left), spark.createDataFrame(right),
                    on=['sym'], ts_col='ts', right_cols=['px'])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert 'CartesianProduct' not in plan
    assert 'BroadcastNestedLoopJoin' not in plan
    assert 'Window' in plan
