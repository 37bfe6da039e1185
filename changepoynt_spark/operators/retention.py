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


def route_tier(tiers: dict, interval_seconds: int):
    """Continuous-aggregate ROUTING: given the resolution a query asks for,
    serve it from the COARSEST stored tier that still divides the request
    evenly — a 6-hour rollup should re-aggregate ~4 rows/key from the 1h
    tier, not ~360 from the 1m tier (and never raw points).

    ``tiers``: {tier_name: DataFrame} as produced by rollup_cascade.
    Returns (tier_name, df).  Raises if no stored tier divides the request
    (caller falls back to raw)."""
    from changepoynt_spark.operators.rollup import TIER_SECONDS
    best = None
    for name in tiers:
        secs = TIER_SECONDS.get(name)
        if secs is None:
            continue
        if interval_seconds % secs == 0 and (best is None or secs > best[1]):
            best = (name, secs)
    if best is None:
        raise ValueError(
            f'no stored tier divides a {interval_seconds}s request '
            f'(have {sorted(tiers)}); aggregate from raw instead')
    return best[0], tiers[best[0]]


def rollup_at(tiers: dict, keys, interval_seconds: int):
    """Answer "aggregates at resolution X" from the routed tier: picks the
    coarsest dividing tier and re-merges it to the requested buckets with
    the algebraic cascade step (exact — every aggregate is mergeable)."""
    from changepoynt_spark.operators.rollup import TIER_SECONDS, rollup_from_rollup
    name, df = route_tier(tiers, interval_seconds)
    if TIER_SECONDS[name] == interval_seconds:
        return name, df
    return name, rollup_from_rollup(df, keys, f'{interval_seconds} seconds')
