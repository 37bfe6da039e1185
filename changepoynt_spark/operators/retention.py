"""Retention policies over the tier tables (north rule: rollup + downsample
+ RETENTION engine).

A policy maps tier -> maximum age.  Old fine-grained data ages out while
coarse tiers are kept longer (the classic raw -> 1m -> 1h -> 1d downsample
ladder), e.g.::

    POLICY = {'raw': '7 days', '1m': '30 days', '1h': '180 days', '1d': None}

``retention_filter`` is a pure Catalyst filter (partition-prunable when the
table is partitioned by tier), so enforcement on read costs nothing;
``IcebergishTable.vacuum`` physically reclaims invalidated snapshots.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_POLICY = {'1m': '30 days', '1h': '180 days', '1d': None}


def retention_filter(df: DataFrame, policy: dict = None, now=None,
                     tier_col: str = 'tier', ts_col: str = 'bucket_start') -> DataFrame:
    """Keep each tier's rows within its max age (None = keep forever).
    Tiers absent from the policy are dropped entirely (aged out)."""
    policy = DEFAULT_POLICY if policy is None else policy
    now_expr = F.lit(now).cast('timestamp') if now is not None else F.current_timestamp()
    cond = F.lit(False)
    for tier, max_age in policy.items():
        tier_match = F.col(tier_col) == tier
        if max_age is None:
            cond = cond | tier_match
        else:
            cond = cond | (tier_match & (F.col(ts_col) >= now_expr - F.expr(f'INTERVAL {max_age}')))
    return df.filter(cond)


def expired_counts(df: DataFrame, policy: dict = None, now=None,
                   tier_col: str = 'tier', ts_col: str = 'bucket_start') -> DataFrame:
    """Report of what retention would drop, per tier (for dry runs)."""
    policy = DEFAULT_POLICY if policy is None else policy
    kept = retention_filter(df, policy, now, tier_col, ts_col) \
        .groupBy(tier_col).agg(F.count('*').alias('kept_rows'))
    total = df.groupBy(tier_col).agg(F.count('*').alias('total_rows'))
    return (total.join(kept, tier_col, 'left')
                 .withColumn('kept_rows', F.coalesce('kept_rows', F.lit(0)))
                 .withColumn('dropped_rows', F.col('total_rows') - F.col('kept_rows')))
