"""Retention policy + vacuum tests."""
import pandas as pd
import pytest
from pyspark.sql import functions as F

from changepoynt_spark.operators.retention import expired_counts, retention_filter
from changepoynt_spark.plans.checkpoint import RollupCheckpointJob
from changepoynt_spark.sources import datagen


@pytest.fixture(scope='module')
def tier_rows(spark):
    rows = []
    base = pd.Timestamp('2026-01-01')
    for tier, days in (('1m', [0, 10, 40]), ('1h', [0, 100, 200]), ('1d', [0, 400])):
        for d in days:
            rows.append(('docA', tier, base + pd.Timedelta(days=d), 1.0))
    pdf = pd.DataFrame(rows, columns=['doc_id', 'tier', 'bucket_start', 'avg_value'])
    return spark.createDataFrame(pdf)


def test_retention_filter_per_tier(spark, tier_rows):
    now = '2026-02-15 00:00:00'  # day 45
    kept = retention_filter(tier_rows, {'1m': '30 days', '1h': '180 days', '1d': None},
                            now=now).toPandas()
    by_tier = kept.groupby('tier').size().to_dict()
    # 1m: only day-40 bucket within 30 days of day-45; 1h: day-0/100/200? ->
    # only those with bucket >= day 45-180 -> all three are in the future or
    # recent... day 100 and 200 are after 'now' (kept), day 0 is 45 days old
    # but within 180 -> kept; 1d: keep-forever -> 2
    assert by_tier == {'1m': 1, '1h': 3, '1d': 2}


def test_retention_drops_unlisted_tiers(spark, tier_rows):
    kept = retention_filter(tier_rows, {'1d': None}, now='2026-02-15 00:00:00').toPandas()
    assert set(kept['tier']) == {'1d'}


def test_expired_counts_report(spark, tier_rows):
    rep = expired_counts(tier_rows, {'1m': '30 days', '1h': '180 days', '1d': None},
                         now='2026-02-15 00:00:00').toPandas().set_index('tier')
    assert rep.loc['1m', 'dropped_rows'] == 2
    assert rep.loc['1h', 'dropped_rows'] == 0
    assert rep.loc['1d', 'dropped_rows'] == 0


def test_vacuum_removes_replaced_snapshots(spark, tmp_path):
    tokens = datagen.tokens_table(spark, n_docs=8, seed=5, max_len=1500,
                                  include_golden=False)
    job = RollupCheckpointJob(str(tmp_path / 'vac'), n_buckets=2, algorithm='moving_window',
                              params={'window_length': 50})
    job.run(spark, tokens)
    # change a doc -> its bucket is reprocessed, old snapshot invalidated
    changed = tokens.withColumn('tokens', F.reverse('tokens'))
    job.run(spark, changed)
    before = job.table.read(spark).count()
    removed = job.table.vacuum()
    assert removed, 'expected invalidated snapshots to be vacuumed'
    after = job.table.read(spark).count()
    assert after == before  # live data untouched


def test_tier_routing_picks_coarsest_dividing_tier(spark, sf_dir):
    from changepoynt_spark.operators import rollup, retention
    ev = spark.read.parquet(f'{sf_dir}/events.parquet')
    tiers = rollup.rollup_cascade(ev, ['user_id'])
    # 6h request: 1h divides (coarsest), 1d does not
    name, df = retention.route_tier(tiers, 6 * 3600)
    assert name == '1h'
    # exact resolution requests route to the tier itself
    assert retention.route_tier(tiers, 86400)[0] == '1d'
    assert retention.route_tier(tiers, 60)[0] == '1m'
    # routed re-aggregation == direct aggregation from raw (mergeability)
    name, six_h = retention.rollup_at(tiers, ['user_id'], 6 * 3600)
    direct = rollup.rollup_from_points(ev, ['user_id'], interval='6 hours')
    a = six_h.toPandas().sort_values(['user_id', 'bucket_start']).reset_index(drop=True)
    b = direct.toPandas().sort_values(['user_id', 'bucket_start']).reset_index(drop=True)
    assert len(a) == len(b) > 0
    import numpy as np
    for c in ('cnt_points', 'min_value', 'max_value', 'first_value', 'last_value'):
        np.testing.assert_array_equal(a[c].to_numpy(), b[c].to_numpy())
    np.testing.assert_allclose(a['sum_value'].astype(float),
                               b['sum_value'].astype(float), rtol=1e-9)
    # sub-tier request has no divisor -> explicit refusal
    import pytest as _pytest
    with _pytest.raises(ValueError):
        retention.route_tier(tiers, 30)
