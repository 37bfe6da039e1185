"""Storage layout for repeated access at scale: bucketed co-located joins
and time-partitioned tier pruning.

Two layout disciplines a 100 TB deployment applies once at WRITE time so
every later query skips work:

- **Bucketing**: tables that join repeatedly on the same key (points with
  per-series metadata, tier with tier) are written ``bucketBy(N, key)``.
  Both sides then satisfy the join's hash-partitioning requirement from
  their file layout alone — the SortMergeJoin plans with ZERO Exchange
  (plan-asserted in tests/test_layout.py), where an unbucketed join
  shuffles BOTH full tables every single run.

- **Time partitioning**: tier tables are written ``partitionBy(day)``
  (derived from bucket_start — Iceberg-style hidden partitioning would
  derive it transparently; plain Spark keeps the explicit column).  Any
  time-ranged read hits only the matching date directories
  (``PartitionFilters`` in the scan, plan-asserted) — the difference
  between scanning a day and scanning a decade.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(df: DataFrame, table_name: str, path: str, keys,
                   n_buckets: int = 64, sort: bool = True) -> None:
    """Write df bucketed (and optionally sorted) by ``keys`` — the layout
    that lets every later equi-join/aggregation on ``keys`` run
    exchange-free.  ``n_buckets`` should match the downstream join fan-out
    (buckets = max useful parallelism for co-located work)."""
    keys = list(keys)
    w = df.write.mode('overwrite').bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.option('path', path).saveAsTable(table_name)


def write_time_partitioned(df: DataFrame, path: str,
                           ts_col: str = 'bucket_start',
                           granularity: str = 'day') -> None:
    """Write a tier time-partitioned for pruning: adds a ``p_date`` column
    (truncated ``ts_col``) and partitions the files by it."""
    part = F.to_date(F.date_trunc(granularity, F.col(ts_col)))
    (df.withColumn('p_date', part)
       .write.mode('overwrite').partitionBy('p_date').parquet(path))


def read_time_range(spark: SparkSession, path: str, start: str, end: str,
                    ts_col: str = 'bucket_start') -> DataFrame:
    """Time-ranged tier read whose date predicate prunes partitions at the
    file index (and whose ts predicate pushes into the parquet scan)."""
    # literals cast to the column's type EXPLICITLY: a bare string literal
    # can coerce the comparison onto the column side, which kills pushdown
    lo = F.to_timestamp(F.lit(start)).cast('timestamp_ntz')
    hi = F.to_timestamp(F.lit(end)).cast('timestamp_ntz')
    return (spark.read.parquet(path)
            .filter((F.col('p_date') >= F.to_date(F.lit(start)))
                    & (F.col('p_date') <= F.to_date(F.lit(end)))
                    & (F.col(ts_col) >= lo) & (F.col(ts_col) <= hi)))


def _zvalue(col_a, col_b, bits: int = 16):
    """Interleave the low ``bits`` of two non-negative int columns into a
    Z-curve value (Morton order) with pure bit expressions."""
    z = F.lit(0).cast('long')
    for i in range(bits):
        bit_a = F.shiftright(col_a, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(col_b, i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(bit_a, 2 * i + 1)) \
             .bitwiseOR(F.shiftleft(bit_b, 2 * i))
    return z


def write_zordered(df: DataFrame, path: str, col_a: str, col_b: str,
                   n_files: int = 16, bits: int = 16) -> None:
    """Write df Z-ORDER clustered on (col_a, col_b): each column is
    rank-bucketed to ``bits`` bits, the buckets are Morton-interleaved, and
    files are range-partitioned by the Z value.

    A single-column sort gives perfect file skipping on ONE dimension and
    none on the other; Z-ordering gives every file a narrow min/max range
    on BOTH columns, so parquet row-group/file pruning works for
    predicates on either (or both) — the reason Iceberg/Delta ship
    rewrite-with-zorder for multi-dim time-series tables (series key x
    time here).  Columns are min/max-scaled into the grid with ONE tiny
    aggregate broadcast back (a global rank/ntile would funnel the table
    through one partition — not a write path for 100 TB; for heavily
    skewed columns substitute approx-quantile cut points, same shape)."""
    n_buckets = 1 << bits

    def num(c):
        # NTZ timestamps cannot cast straight to double; route via TIMESTAMP
        dt = dict(df.dtypes)[c]
        col = F.col(c)
        if dt.startswith('timestamp'):
            col = F.unix_micros(col.cast('timestamp'))
        return col.cast('double')
    stats = df.agg(F.min(num(col_a)).alias('_a0'), F.max(num(col_a)).alias('_a1'),
                   F.min(num(col_b)).alias('_b0'), F.max(num(col_b)).alias('_b1'))
    z = df.crossJoin(F.broadcast(stats))
    scale = lambda c, lo, hi: F.least(  # noqa: E731
        F.lit(n_buckets - 1),
        F.floor((num(c) - F.col(lo)) / (F.col(hi) - F.col(lo) + F.lit(1e-12))
                * n_buckets)).cast('long')
    z = (z.withColumn('_za', scale(col_a, '_a0', '_a1'))
          .withColumn('_zb', scale(col_b, '_b0', '_b1'))
          .drop('_a0', '_a1', '_b0', '_b1'))
    z = z.withColumn('_z', _zvalue(F.col('_za'), F.col('_zb'), bits))
    (z.repartitionByRange(n_files, '_z')
      .sortWithinPartitions('_z')
      .drop('_za', '_zb', '_z')
      .write.mode('overwrite').parquet(path))
