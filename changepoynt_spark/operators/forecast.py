"""Holt linear (double) exponential smoothing + h-step forecast.

The forecasting layer of a rollup engine: per key, the classic Holt
recursions over a REGULAR tier series (gap-fill first if sparse),

    fitted[t] = l + b                       (one-step-ahead, before x[t])
    l'        = alpha * x[t] + (1 - alpha) * (l + b)
    b'        = beta * (l' - l) + (1 - beta) * b

with the h-step forecast  yhat[T+h] = l_T + h * b_T.  (For seasonal data,
compose with operators.window_ops.seasonal_decompose: Holt on the
deseasonalized series + the phase seasonal — the classical decomposition
forecast.)

Cross-engine exactness: the recursion is sequential, so float error would
otherwise accumulate differently across engines; instead EVERY state value
is re-quantized each step by the explicit quantizer

    q6(v) = floor(v * 1e6 + 0.5) / 1e6

(floor-based — Python round() is half-EVEN while SQL round() is half-away,
so neither is used), making the state an exact multiple of 1e-6 after each
step.  Both engines then execute the identical expression shapes on
identical IEEE-754 operands, and the whole fit+forecast is digit-exact —
the DuckDB twin steps the same recursion as a recursive CTE (the LTTB
oracle pattern).

Scale shape: one shuffle on the keys, O(n) sequential per key inside an
Arrow grouped-map — per-series state is (l, b), never materialized history.
"""
from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _q6(v: float) -> float:
    return math.floor(v * 1e6 + 0.5) / 1e6


def holt_forecast(df: DataFrame, keys, alpha: float = 0.5,
                  beta: float = 0.25, horizon: int = 0,
                  ts_col: str = 'ts', value_col: str = 'value') -> DataFrame:
    """Per-key Holt fit (+ ``horizon`` forecast rows).

    Output: (keys, rn, ts, value, level, trend, fitted) — observed rows
    carry their value and the one-step-ahead ``fitted`` (NULL at rn 0, the
    init row: level = x[0], trend = 0); forecast rows (rn >= n) carry NULL
    value/level/trend and ``fitted`` = l_T + h*b_T, with ts advanced by the
    series' LAST observed step (regular tiers: the tier interval).
    Forecast rows require n >= 2 (a step is needed to place their ts).
    """
    import numpy as np
    import pandas as pd

    keys = list(keys)
    a, be = float(alpha), float(beta)
    key_fields = [df.schema[k] for k in keys]
    out_schema = T.StructType(key_fields + [
        T.StructField('rn', T.IntegerType(), False),
        T.StructField(ts_col, df.schema[ts_col].dataType, True),
        T.StructField(value_col, T.DoubleType(), True),
        T.StructField('level', T.DoubleType(), True),
        T.StructField('trend', T.DoubleType(), True),
        T.StructField('fitted', T.DoubleType(), True)])

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        x = pdf[value_col].to_numpy(dtype=float)
        ts = pd.to_datetime(pdf[ts_col]).astype('datetime64[us]')
        n = len(x)
        lvl, tr, fit_ = [None] * n, [None] * n, [None] * n
        l, b = x[0], 0.0
        lvl[0], tr[0] = l, b
        for t in range(1, n):
            f = _q6(l + b)
            fit_[t] = f
            l_new = _q6(a * x[t] + (1 - a) * (l + b))
            b_new = _q6(be * (l_new - l) + (1 - be) * b)
            l, b = l_new, b_new
            lvl[t], tr[t] = l, b
        out = pd.DataFrame({
            'rn': range(n), ts_col: ts, value_col: x,
            'level': lvl, 'trend': tr, 'fitted': fit_})
        if horizon and n >= 2:
            step = ts.iloc[-1] - ts.iloc[-2]
            # typed all-NA columns (float64 NaN -> Arrow nulls, same rows
            # as the old object-dtype None columns) so the concat sees
            # matching dtypes and never trips pandas' all-NA FutureWarning
            # / future dtype change
            na = np.full(horizon, np.nan)
            fc = pd.DataFrame({
                'rn': [n - 1 + h for h in range(1, horizon + 1)],
                ts_col: [ts.iloc[-1] + h * step
                         for h in range(1, horizon + 1)],
                value_col: na,
                'level': na, 'trend': na,
                'fitted': [_q6(l + h * b) for h in range(1, horizon + 1)]})
            out = pd.concat([out, fc], ignore_index=True)
        for k in keys:
            out[k] = pdf[k].iloc[0]
        return out[keys + ['rn', ts_col, value_col, 'level', 'trend',
                           'fitted']]

    if keys:
        return df.groupBy(*keys).applyInPandas(fit, schema=out_schema)
    # keys=[]: one logical series — a constant grouping column makes it one
    # grouped-map task (the tier is already small by construction)
    return (df.withColumn('_g', F.lit(1)).groupBy('_g')
              .applyInPandas(fit, schema=out_schema))
