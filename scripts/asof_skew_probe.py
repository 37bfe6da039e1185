#!/usr/bin/env python
"""As-of join skew probe (r7): a 90%-one-key distribution must not
serialize into one window task.

Generates a skewed left side (90% of rows on one hot key) + a sparse right
side, runs asof_join with and without the slice_interval skew guard, and
reports wall time plus the max rows any single window partition processes
(the deterministic proxy for max-task time).  Results append to
BENCH/R7_NOTES.md by hand.

    python scripts/asof_skew_probe.py [--rows 2000000]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--rows', type=int, default=2_000_000)
    ap.add_argument('--slice', default='1 hour')
    args = ap.parse_args()
    from pyspark.sql import functions as F
    from changepoynt_spark.session import get_spark
    from changepoynt_spark.operators.asof import asof_join
    spark = get_spark(app_name='asof-skew-probe')
    n = args.rows
    left = (spark.range(n)
            .withColumn('sym', F.when(F.pmod('id', 10) < 9, F.lit('HOT'))
                               .otherwise(F.concat(F.lit('k'),
                                                   F.pmod('id', 7))))
            .withColumn('ts', F.to_timestamp(F.lit('2026-01-01'))
                        + F.make_interval(secs=F.pmod(F.xxhash64('id'),
                                                      30_000_000)))
            .withColumn('qty', F.pmod('id', 100))
            .drop('id'))
    right = (spark.range(4000)
             .withColumn('sym', F.when(F.pmod('id', 4) < 2, F.lit('HOT'))
                                .otherwise(F.concat(F.lit('k'),
                                                    F.pmod('id', 7))))
             .withColumn('ts', F.to_timestamp(F.lit('2026-01-01'))
                         + F.make_interval(secs=F.pmod(F.xxhash64('id', 'id'),
                                                       30_000_000)))
             .withColumn('px', (F.pmod('id', 1000) / 10.0))
             .drop('id'))
    left.cache().count()
    right.cache().count()
    rows = []
    sums = {}
    for label, kw in (('unsliced (per-key window)', {}),
                      (f'sliced ({args.slice} + carry)',
                       {'slice_interval': args.slice})):
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            # decimal checksums: order-independent, so plan equivalence
            # is exact (double sums drift with task order)
            px = F.coalesce(F.col('px_r'), F.lit(0.0)).cast('decimal(18,4)')
            agg = asof_join(left, right, on=['sym'], right_cols=['px'],
                            **kw).agg(
                F.count('*').alias('n'),
                F.sum(px).alias('s'),
                F.sum(px * F.col('qty')).alias('sq')).first()
            walls.append(time.perf_counter() - t0)
        sums[label] = (agg['n'], str(agg['s']), str(agg['sq']))
        # max rows one window partition sees (the serialization proxy)
        if kw:
            part = left.select('sym', F.window(
                'ts', args.slice).start.alias('_sl')).groupBy('sym', '_sl')
        else:
            part = left.groupBy('sym')
        mx = part.count().agg(F.max('count')).first()[0]
        rows.append((label, min(walls), mx))
        print(f'{label}: wall best-of-2 {min(walls):.2f}s, '
              f'max window-partition rows {mx:,}')
    labels = list(sums)
    assert sums[labels[0]] == sums[labels[1]], \
        f'sliced != unsliced: {sums}'
    print('result checksums identical across plans:', sums[labels[0]])
    print()
    print('| plan | wall best-of-2 (s) | max rows in one window partition |')
    print('|---|---|---|')
    for label, wall, mx in rows:
        print(f'| {label} | {wall:.2f} | {mx:,} |')
    spark.stop()


if __name__ == '__main__':
    main()
