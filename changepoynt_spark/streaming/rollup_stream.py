"""Structured Streaming tier rollup (engine-new; the reference's only
"streaming" is a buffered batch replay, see
/root/reference/docs/guides/experimental-buffered-streaming.md).

The tier cascade's base aggregation as a streaming query: watermarked
windowed aggregates, append mode (a bucket is emitted exactly once, when the
watermark passes its end — the contract an incremental continuous aggregate
needs).  Scoring stays batch: kernel state (the SST feedback eigenvector) is
sequential within a series (SURVEY.md §2.9), so the streaming path covers the
rollup of already-scored or raw points.

Aggregates match the batch tier exactly (same names/semantics as
operators.rollup.rollup_from_points).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_rollup(stream_df: DataFrame, keys, ts_col: str = 'ts', value_col: str = 'value',
                     interval: str = '1 minute', watermark_delay: str = '2 minutes') -> DataFrame:
    """Streaming equivalent of rollup_from_points: watermarked windowed agg.

    Use with ``.writeStream.outputMode('append')`` for exactly-once bucket
    emission of closed windows (late rows beyond ``watermark_delay`` are
    dropped), or 'complete' for a fully materialized small tier."""
    keys = list(keys)
    # watermarks require TIMESTAMP (tz-aware); parquet fixtures are NTZ.
    # the session timezone is pinned to UTC, so this cast is deterministic
    stream_df = stream_df.withColumn(ts_col, F.col(ts_col).cast('timestamp'))
    agg = (stream_df
           .withWatermark(ts_col, watermark_delay)
           .groupBy(*keys, F.window(ts_col, interval).alias('w'))
           .agg(F.count(value_col).alias('cnt_points'),
                F.sum(value_col).alias('sum_value'),
                F.min(value_col).alias('min_value'),
                F.max(value_col).alias('max_value'),
                F.min_by(value_col, ts_col).alias('first_value'),
                F.max_by(value_col, ts_col).alias('last_value')))
    return (agg.withColumn('avg_value', F.col('sum_value') / F.col('cnt_points'))
               .withColumn('bucket_start', F.col('w.start'))
               .drop('w'))
