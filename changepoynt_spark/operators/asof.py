"""As-of join — align each left row with the most recent right row at or
before it (per key), the workhorse join of every time-series store (quotes
to trades, sensor state to events, config snapshots to points).

Spark-first design: NOT a range join (a theta join on ts <= ts explodes to
O(|L| x |R|) per key before limiting), but the union + running-window trick:

  1. tag right rows 0 and left rows 1, union them (schema-aligned),
  2. one window partitioned by the join keys, ordered by (ts, tag),
     running frame [unboundedPreceding, current]:
     last(<right value>, ignorenulls) at a left row IS the as-of match —
     right rows sort before left rows at equal timestamps, so ties take the
     right row at exactly the left timestamp (standard backward semantics,
     same as DuckDB ASOF JOIN and pandas merge_asof),
  3. keep the left rows.

Cost: ONE hash exchange on the join keys + a per-partition sort — the same
shuffle a plain equi-join would pay, with no candidate blow-up; the running
frame is the O(n) incremental evaluator (same discipline as gap_fill).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on, ts_col: str = 'ts',
              right_cols=None, direction: str = 'backward',
              tolerance_seconds: float = None, suffix: str = '_r',
              slice_interval: str = None) -> DataFrame:
    """Left as-of join: every ``left`` row gains, for each of ``right_cols``,
    the value from the nearest ``right`` row at-or-before it (``backward``)
    or at-or-after it (``forward``) with the same ``on`` keys, plus
    ``{ts_col}{suffix}`` = the matched right timestamp.

    ``tolerance_seconds`` nulls matches farther than the tolerance (the
    matched timestamp included), mirroring pandas merge_asof semantics.
    Rows with no match keep null columns (left join).

    ``slice_interval`` (e.g. ``'1 hour'``) is the PER-KEY SKEW GUARD: the
    default plan is one hash exchange + a running window per key, so a
    single hot key (one sensor producing 90% of the points) serializes
    into one task.  With a slice interval, rows are windowed by
    (keys, time-slice) instead; every slice whose in-slice scan cannot see
    an earlier/later right row gets a synthetic CARRY row — the boundary
    as-of state, computed on the (keys x slices) SUMMARY table (tiny) by
    the same running-window trick — injected at the slice edge, so results
    are IDENTICAL to the unsliced plan (asserted in tests) while the hot
    key parallelizes across its slices.  Same discipline as
    chunk-with-halo for the kernels: slice the sequential scan, carry one
    row of boundary state."""
    if direction not in ('backward', 'forward'):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    on = list(on)
    right_cols = list(right_cols if right_cols is not None
                      else [c for c in right.columns if c not in on + [ts_col]])
    matched_ts = f'{ts_col}{suffix}'

    r = right.select(*on, F.col(ts_col),
                     F.col(ts_col).alias(matched_ts),
                     *[F.col(c).alias(f'_rv_{c}') for c in right_cols],
                     F.lit(0).alias('_tag'),
                     *[F.lit(None).cast(left.schema[c].dataType).alias(f'_lv_{c}')
                       for c in left.columns if c not in on + [ts_col]])
    l = left.select(*on, F.col(ts_col),
                    F.lit(None).cast(right.schema[ts_col].dataType).alias(matched_ts),
                    *[F.lit(None).cast(right.schema[c].dataType).alias(f'_rv_{c}')
                      for c in right_cols],
                    F.lit(1).alias('_tag'),
                    *[F.col(c).alias(f'_lv_{c}')
                      for c in left.columns if c not in on + [ts_col]])
    u = r.unionByName(l)

    part_keys = list(on)
    if slice_interval is not None:
        ts_t = right.schema[ts_col].dataType
        slice_of = F.window(F.col(ts_col).cast('timestamp'), slice_interval)

        def with_slice(df):
            return df.withColumn('_sl', slice_of.getField('start'))

        u = with_slice(u)
        # boundary state per (keys, slice): the last (backward) / first
        # (forward) right row of each slice, carried across the
        # (keys x slices) spine by the same running-window trick — one
        # summary row per slice, so the sequential scan is summary-sized
        pick = F.struct(F.col(matched_ts).alias('_c_ts'),
                        *[F.col(f'_rv_{c}').alias(f'_c_{c}')
                          for c in right_cols])
        edge = (F.max_by(pick, F.col(ts_col)) if direction == 'backward'
                else F.min_by(pick, F.col(ts_col)))
        summ = (with_slice(r).groupBy(*on, '_sl').agg(edge.alias('_s')))
        spine = u.select(*on, '_sl').distinct()
        summ = spine.join(summ, on + ['_sl'], 'left')
        worder = (F.col('_sl').asc() if direction == 'backward'
                  else F.col('_sl').desc())
        wprev = (Window.partitionBy(*on).orderBy(worder)
                 .rowsBetween(Window.unboundedPreceding, -1))
        carry = (summ.withColumn('_c', F.last('_s', ignorenulls=True)
                                        .over(wprev))
                     .filter(F.col('_c').isNotNull()))
        # inject the carry at the slice edge: backward scans meet it first
        # at the slice start, forward scans at the slice end (rows with
        # ts == end belong to the NEXT slice, so the edge sorts first in a
        # descending scan); tag -1 keeps real right rows winning ties
        edge_ts = (F.col('_sl') if direction == 'backward'
                   else F.col('_sl') + F.expr(f'INTERVAL {slice_interval}'))
        carry_rows = carry.select(
            *on,
            edge_ts.cast(ts_t).alias(ts_col),
            F.col('_c._c_ts').alias(matched_ts),
            *[F.col(f'_c._c_{c}').alias(f'_rv_{c}') for c in right_cols],
            F.lit(-1).alias('_tag'),
            *[F.lit(None).cast(left.schema[c].dataType).alias(f'_lv_{c}')
              for c in left.columns if c not in on + [ts_col]],
            F.col('_sl'))
        u = u.unionByName(carry_rows)
        part_keys = on + ['_sl']

    if direction == 'backward':
        # right rows (tag 0) sort before left rows at equal ts -> ties match
        order = Window.partitionBy(*part_keys).orderBy(
            F.col(ts_col).asc(), F.col('_tag').asc())
    else:
        # descending scan; right rows must still come first at equal ts
        order = Window.partitionBy(*part_keys).orderBy(
            F.col(ts_col).desc(), F.col('_tag').asc())
    w = order.rowsBetween(Window.unboundedPreceding, 0)

    picked = [F.last(f'_rv_{c}', ignorenulls=True).over(w).alias(f'_m_{c}')
              for c in right_cols]
    picked_ts = F.last(matched_ts, ignorenulls=True).over(w).alias('_m_ts')
    out = (u.select(*on, ts_col, '_tag',
                    *[c for c in u.columns if c.startswith('_lv_')],
                    picked_ts, *picked)
            .filter(F.col('_tag') == 1))

    m_ts = F.col('_m_ts')
    if tolerance_seconds is not None:
        # cast: fixtures carry TIMESTAMP_NTZ, unix_micros needs TIMESTAMP
        # (session timezone pinned to UTC -> deterministic)
        gap = F.abs(F.unix_micros(F.col(ts_col).cast('timestamp'))
                    - F.unix_micros(m_ts.cast('timestamp'))) / 1e6
        ok = m_ts.isNotNull() & (gap <= tolerance_seconds)
        out = out.select(*on, ts_col,
                         *[F.col(f'_lv_{c}').alias(c)
                           for c in left.columns if c not in on + [ts_col]],
                         F.when(ok, m_ts).alias(matched_ts),
                         *[F.when(ok, F.col(f'_m_{c}')).alias(f'{c}{suffix}')
                           for c in right_cols])
    else:
        out = out.select(*on, ts_col,
                         *[F.col(f'_lv_{c}').alias(c)
                           for c in left.columns if c not in on + [ts_col]],
                         m_ts.alias(matched_ts),
                         *[F.col(f'_m_{c}').alias(f'{c}{suffix}')
                           for c in right_cols])
    return out


def interval_join(points: DataFrame, intervals: DataFrame, on=(),
                  ts_col: str = 'ts', lo_col: str = 'lo', hi_col: str = 'hi',
                  bucket_seconds: int = 3600, interval_cols=None) -> DataFrame:
    """Range (interval) join: every ``points`` row paired with every
    ``intervals`` row whose [lo, hi] contains its timestamp (bounds
    inclusive), optionally per equi-key ``on``.

    Spark-first design: NOT the naive theta join (Catalyst plans
    ts >= lo AND ts <= hi as BroadcastNestedLoopJoin — O(|P| x |I|) at any
    scale) but the standard time-bucket blocking:

      1. each interval is exploded to the buckets it spans
         (sequence(floor(lo), floor(hi), bucket)) — an interval appears in
         span/bucket_seconds buckets,
      2. each point belongs to EXACTLY ONE bucket (floor(ts)), so the
         equi-join on (keys, bucket) meets every qualifying pair exactly
         once — no post-join dedup — and runs as a plain shuffled hash
         join,
      3. the residual predicate ts BETWEEN lo AND hi filters within the
         bucket.

    Shuffle volume: |P| + Σ span_i/bucket (pick ``bucket_seconds`` near the
    median interval span so most intervals land in O(1) buckets).  Skewed
    buckets (a bucket holding many points AND many intervals) are AQE
    skew-join territory; the blocking keys make that visible to AQE, which
    a nested-loop join never is.
    """
    on = list(on)
    interval_cols = list(interval_cols if interval_cols is not None
                         else [c for c in intervals.columns
                               if c not in on + [lo_col, hi_col]])
    bucket = lambda c: (F.unix_micros(F.col(c).cast('timestamp'))
                        / (bucket_seconds * 1_000_000)).cast('long')  # noqa: E731
    # explicit side aliases + qualified names: when points and intervals
    # share lineage (self-join), resolution must not lean on Spark's
    # dataset-id disambiguation heuristic ("trivially true equals" warning)
    iv = intervals.select(
        *on, lo_col, hi_col, *interval_cols,
        F.explode(F.sequence(bucket(lo_col), bucket(hi_col))).alias('_b')).alias('iv')
    pt = points.withColumn('_b', bucket(ts_col)).alias('pt')
    cond = [F.col('pt._b') == F.col('iv._b')] + \
           [F.col(f'pt.{k}') == F.col(f'iv.{k}') for k in on]
    out = (pt.join(iv, on=cond, how='inner')
             .where((F.col(f'pt.{ts_col}') >= F.col(f'iv.{lo_col}'))
                    & (F.col(f'pt.{ts_col}') <= F.col(f'iv.{hi_col}'))))
    return out.select(*[F.col(f'pt.{c}') for c in points.columns],
                      *[F.col(f'iv.{c}') for c in [lo_col, hi_col] + interval_cols])
