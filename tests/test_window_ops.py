

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


def test_holt_forecast_linear_convergence_and_keyed(spark):
    """On a pure line Holt's trend converges to the exact slope and the
    forecast extends the line exactly (q6 state is noise-free on round-6
    inputs); keyed series fit independently; forecast ts advances by the
    observed step."""
    import datetime as dt
    from changepoynt_spark.operators.forecast import holt_forecast
    rows = []
    for key, slope in (('a', 0.5), ('b', -1.25)):
        for i in range(60):
            rows.append((key, dt.datetime(2026, 1, 1) + dt.timedelta(hours=i),
                         round(2.0 + slope * i, 6)))
    df = spark.createDataFrame(rows, 'k string, ts timestamp, value double')
    out = (holt_forecast(df, ['k'], alpha=0.5, beta=0.25, horizon=4)
           .toPandas().sort_values(['k', 'rn']).reset_index(drop=True))
    for key, slope in (('a', 0.5), ('b', -1.25)):
        sub = out[out['k'] == key].reset_index(drop=True)
        assert abs(sub['trend'].iloc[59] - slope) < 2e-6   # q6 floor
        last_v = 2.0 + slope * 59
        for h in range(1, 5):
            fc = sub[sub['rn'] == 59 + h]
            assert len(fc) == 1
            assert abs(fc['fitted'].iloc[0] - (last_v + slope * h)) < 1e-5
            assert fc['ts'].iloc[0] == (dt.datetime(2026, 1, 1)
                                        + dt.timedelta(hours=59 + h))
        # interior fitted == actual on a line once converged
        mid = sub[(sub['rn'] > 40) & (sub['rn'] < 60)]
        assert (mid['fitted'] - mid['value']).abs().max() < 1e-5


def test_seasonal_adjustment_unmasks_anomalies(spark):
    """The composition that motivates the decomposition: a spike INSIDE the
    seasonal swing is invisible to raw deviation-from-mean (the daily cycle
    dwarfs it) but obvious in the decomposition residual."""
    import datetime as dt
    import math
    import numpy as np
    from changepoynt_spark.operators.window_ops import seasonal_decompose
    rows = []
    for i in range(240):
        v = 50.0 * math.sin(2 * math.pi * (i % 24) / 24)
        if i == 96:   # phase 0: the sine is ~0 here
            v += 8.0            # small vs the +/-50 seasonal swing
        rows.append((dt.datetime(2026, 1, 1) + dt.timedelta(hours=i),
                     round(v, 6)))
    df = spark.createDataFrame(rows, 'ts timestamp, value double')
    out = (seasonal_decompose(df, [], period=24).toPandas()
           .sort_values('ts').reset_index(drop=True))
    vals = out['value'].to_numpy()
    resid = out['resid'].to_numpy(dtype=float)
    # raw z: the spike row is nowhere near the most extreme raw value
    raw_z = np.abs(vals - vals.mean()) / vals.std()
    assert raw_z[96] < 0.5 * np.nanmax(raw_z)
    # residual: the spike row IS the extreme, by a wide margin
    r = np.abs(np.nan_to_num(resid))
    assert r.argmax() == 96
    second = np.partition(r, -2)[-2]
    assert r[96] > 5 * max(second, 1e-9)
