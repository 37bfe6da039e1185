

def test_seasonal_decompose_recovers_planted_components(spark):
    """Planted trend + 24-phase sinusoid: seasonal recovers the wave (MA
    distortion < 1e-6 on a pure signal), interior residuals are ~0, trend
    is NULL on exactly period/2 rows at each edge, and the seasonal
    component centers to ~0 over one period."""
    import datetime as dt
    import math
    import numpy as np
    from changepoynt_spark.operators.window_ops import seasonal_decompose
    rows = []
    for i in range(240):
        v = round(0.01 * i + 5.0 * math.sin(2 * math.pi * (i % 24) / 24), 6)
        rows.append((dt.datetime(2026, 1, 1) + dt.timedelta(hours=i), v))
    df = spark.createDataFrame(rows, 'ts timestamp, value double')
    out = (seasonal_decompose(df, [], period=24).toPandas()
           .sort_values('ts').reset_index(drop=True))
    assert out['trend'].isna().sum() == 24      # 12 at each edge
    ph = np.arange(len(out)) % 24
    exp = 5.0 * np.sin(2 * np.pi * ph / 24)
    mid = slice(30, 200)
    assert np.abs(out['seasonal'].to_numpy()[mid] - exp[mid]).max() < 1e-5
    assert np.abs(out['resid'].to_numpy(dtype=float)[mid]).max() < 1e-5
    assert abs(out.groupby(ph)['seasonal'].first().sum()) < 1e-4
    # additivity holds exactly at the rounded precision
    interior = out.dropna()
    recon = (interior['trend'] + interior['seasonal']
             + interior['resid']).to_numpy()
    assert np.abs(recon - interior['value'].to_numpy()).max() < 2e-6


def test_seasonal_decompose_keyed_and_partition_invariant(spark):
    import datetime as dt
    import math
    from changepoynt_spark.operators.window_ops import seasonal_decompose
    rows = []
    for key, amp in (('a', 3.0), ('b', 7.0)):
        for i in range(120):
            v = round(amp * math.sin(2 * math.pi * (i % 12) / 12) + 0.02 * i, 6)
            rows.append((key, dt.datetime(2026, 1, 1) + dt.timedelta(hours=i), v))
    df = spark.createDataFrame(rows, 'k string, ts timestamp, value double')
    a = (seasonal_decompose(df, ['k'], period=12).toPandas()
         .sort_values(['k', 'ts']).reset_index(drop=True))
    b = (seasonal_decompose(df.repartition(13), ['k'], period=12).toPandas()
         .sort_values(['k', 'ts']).reset_index(drop=True))
    assert a.astype(str).equals(b.astype(str))
    # keys independent: amplitude ratio survives in the seasonal component
    sa = a[a['k'] == 'a']['seasonal'].abs().max()
    sb = a[a['k'] == 'b']['seasonal'].abs().max()
    assert 1.8 < sb / sa < 2.8


def test_cross_correlation_planted_lead_lag(spark):
    """b is a shifted by 2 rows (b[t] = a[t-2]) plus noise: xcorr peaks at
    lag +2 (a leads b); n_pairs shrinks by |lag|; lag 0 stays below the
    peak."""
    import datetime as dt
    import math
    from changepoynt_spark.operators.window_ops import cross_correlation
    rows = []
    vals = [round(math.sin(i / 5.0) * 10 + (i % 7) * 0.3, 6)
            for i in range(200)]
    for i in range(200):
        ts = dt.datetime(2026, 1, 1) + dt.timedelta(hours=i)
        rows.append(('a', ts, vals[i]))
        rows.append(('b', ts, vals[i - 2] if i >= 2 else 0.0))
    df = spark.createDataFrame(rows, 'k string, ts timestamp, value double')
    out = (cross_correlation(df, 'k', 'a', 'b', lags=range(-4, 5))
           .toPandas().set_index('lag'))
    assert out['xcorr'].idxmax() == 2
    assert out.loc[2, 'xcorr'] > 0.999
    assert out.loc[2, 'xcorr'] > out.loc[0, 'xcorr'] + 0.05
    # row alignment: lag L loses |L| pairs off one end
    assert out.loc[0, 'n_pairs'] - out.loc[4, 'n_pairs'] == 4
    assert out.loc[0, 'n_pairs'] - out.loc[-4, 'n_pairs'] == 4
