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


def test_interval_join_inclusive_bounds_and_bucket_spans(spark):
    from changepoynt_spark.operators.asof import interval_join
    import datetime as dt
    TS = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)  # noqa: E731
    pts = spark.createDataFrame(
        [(1, TS(0)), (2, TS(10)), (3, TS(20)), (4, TS(30)), (5, TS(59))],
        'pid long, ts timestamp')
    iv = spark.createDataFrame(
        # [10, 30] inclusive both ends; bucket_seconds=7 forces multi-bucket
        # spans, so exactly-once matching across bucket boundaries is exercised
        [(100, TS(10), TS(30)), (200, TS(29), TS(59))],
        'iid long, lo timestamp, hi timestamp')
    out = interval_join(pts, iv, on=(), ts_col='ts', bucket_seconds=7,
                        interval_cols=('iid',)).toPandas()
    pairs = sorted(zip(out['pid'], out['iid']))
    # pid 2 at lo, pid 4 at hi: inclusive; pid 4 and 5 also inside [29,59]
    assert pairs == [(2, 100), (3, 100), (4, 100), (4, 200), (5, 200)]


def test_interval_join_keys_and_plan_has_no_nested_loop(spark):
    from changepoynt_spark.operators.asof import interval_join
    import datetime as dt
    TS = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)  # noqa: E731
    pts = spark.createDataFrame([(7, 1, TS(5)), (8, 2, TS(5))],
                                'uid long, pid long, ts timestamp')
    iv = spark.createDataFrame([(7, 9, TS(0), TS(10))],
                               'uid long, iid long, lo timestamp, hi timestamp')
    out = interval_join(pts, iv, on=('uid',), ts_col='ts', bucket_seconds=60,
                        interval_cols=('iid',))
    pdf = out.toPandas()
    assert list(zip(pdf['uid'], pdf['pid'], pdf['iid'])) == [(7, 1, 9)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert 'BroadcastNestedLoopJoin' not in plan
    assert 'CartesianProduct' not in plan


import pytest as _pytest


@_pytest.mark.parametrize('seed', [0, 1, 2])
def test_interval_join_randomized_vs_bruteforce(spark, seed):
    import datetime as dt
    import numpy as np
    from changepoynt_spark.operators.asof import interval_join
    rng = np.random.default_rng(seed)
    base = dt.datetime(2026, 1, 1)
    pts = [(int(rng.integers(0, 3)), base + dt.timedelta(seconds=int(s)), i)
           for i, s in enumerate(rng.integers(0, 50_000, size=200))]
    ivs = []
    for j in range(60):
        lo = int(rng.integers(0, 48_000))
        ivs.append((int(rng.integers(0, 3)), base + dt.timedelta(seconds=lo),
                    base + dt.timedelta(seconds=lo + int(rng.integers(1, 9000))), j))
    pdf = spark.createDataFrame(pts, 'k long, ts timestamp, pid long')
    idf = spark.createDataFrame(ivs, 'k long, lo timestamp, hi timestamp, iid long')
    got = {(r['pid'], r['iid']) for r in
           interval_join(pdf, idf, on=('k',), ts_col='ts', bucket_seconds=777,
                         interval_cols=('iid',)).collect()}
    want = {(p[2], v[3]) for p in pts for v in ivs
            if p[0] == v[0] and v[1] <= p[1] <= v[2]}
    assert got == want


@pytest.mark.parametrize('direction', ['backward', 'forward'])
def test_asof_sliced_matches_unsliced_and_pandas(spark, frames, direction):
    """r7 skew guard: slice_interval windows the scan by (key, time-slice)
    with boundary-carry rows — results must be IDENTICAL to the unsliced
    plan (and to pandas), including cross-slice matches and tolerance."""
    left, right = frames
    ld, rd = spark.createDataFrame(left), spark.createDataFrame(right)
    for tol in (None, 900):
        got = (asof_join(ld, rd, on=['sym'], ts_col='ts', right_cols=['px'],
                         direction=direction, tolerance_seconds=tol,
                         slice_interval='10 minutes')
               .toPandas().sort_values(['sym', 'ts', 'qty'])
               .reset_index(drop=True))
        plain = (asof_join(ld, rd, on=['sym'], ts_col='ts',
                           right_cols=['px'], direction=direction,
                           tolerance_seconds=tol)
                 .toPandas().sort_values(['sym', 'ts', 'qty'])
                 .reset_index(drop=True))
        pd.testing.assert_frame_equal(got, plain)
        kw = {'direction': direction}
        if tol is not None:
            kw['tolerance'] = pd.Timedelta(seconds=tol)
        exp = _expected(left, right, **kw)
        pd.testing.assert_series_equal(got['px_r'], exp['px_r'],
                                       check_names=False)


def test_asof_sliced_hot_key_parallelizes(spark):
    """A 90%-one-key distribution: the sliced plan spreads the hot key's
    rows over many window partitions (asserted on the partition key's
    distinct count), and the matches stay exact across slice boundaries
    (sparse right side: most slices have NO right row, so carries do the
    work)."""
    import numpy as np
    base = pd.Timestamp('2026-01-01')
    rng = np.random.default_rng(11)
    n = 20_000
    keys = np.where(rng.uniform(size=n) < 0.9, 'HOT',
                    rng.choice(['a', 'b', 'c'], n))
    left = pd.DataFrame({
        'sym': keys,
        'ts': base + pd.to_timedelta(
            np.sort(rng.integers(0, 2_000_000, n)), unit='s'),
        'qty': rng.integers(1, 9, n).astype('int64'),
    })
    # sparse right: one row every ~6 hours -> most 1h slices carry
    right = pd.DataFrame({
        'sym': rng.choice(['HOT', 'a', 'b'], 90),
        'ts': base + pd.to_timedelta(
            np.sort(rng.integers(0, 2_000_000, 90)), unit='s'),
        'px': np.round(rng.uniform(1, 2, 90), 4),
    }).drop_duplicates(['sym', 'ts'])
    ld, rd = spark.createDataFrame(left), spark.createDataFrame(right)
    got = (asof_join(ld, rd, on=['sym'], right_cols=['px'],
                     slice_interval='1 hour')
           .toPandas().sort_values(['sym', 'ts', 'qty'])
           .reset_index(drop=True))
    exp = _expected(left, right, direction='backward')
    pd.testing.assert_series_equal(got['px_r'], exp['px_r'],
                                   check_names=False)
    # the hot key's window state spreads across its slices
    from pyspark.sql import functions as F
    n_slices = (ld.filter(F.col('sym') == 'HOT')
                .select(F.window('ts', '1 hour').start.alias('s'))
                .distinct().count())
    assert n_slices > 100
