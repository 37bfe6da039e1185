"""Table evolution: partition-spec evolution, schema evolution, rollback,
timestamp time travel.  Iceberg's core metadata capabilities — specs and
schemas are per-snapshot, so a table written under three different layouts
must read/scan exactly like one table, and rollback must be a pure
version-hint flip that forks the lineage without reusing ids."""
import datetime

import pytest
from pyspark.sql import functions as F

from changepoynt_spark.sources.tables import IcebergishTable

COLS = ['event_id', 'ts', 'user_id', 'event_type', 'value']


@pytest.fixture(scope='module')
def events(spark, sf_dir):
    df = spark.read.parquet(f'{sf_dir}/events.parquet').select(*COLS)
    df.cache().count()
    return df


def _rows(df):
    return sorted(tuple(r) for r in df.select(*COLS).collect())


def test_partition_spec_evolution_reads_and_scans_exactly(spark, events, tmp_path):
    """Three appends under three different partition specs (string hidden
    partition -> unpartitioned -> int hidden partition) must read as one
    table, and a predicate must prune each snapshot by ITS OWN spec (path
    values where partitioned, footer stats where not)."""
    t = IcebergishTable(str(tmp_path / 'ev'))
    t.append(events.filter(F.col('event_id') % 3 == 0),
             partition_by=('event_type',))
    t.append(events.filter(F.col('event_id') % 3 == 1), partition_by=())
    t.append(events.filter(F.col('event_id') % 3 == 2),
             partition_by=('user_id',))

    assert _rows(t.read(spark)) == _rows(events)

    uid = int(events.first()['user_id'])
    preds = [('user_id', '=', uid)]
    plan = t.plan_files(preds)
    assert 0 < plan['n_kept'] < plan['n_total']
    # snapshot 2 is partitioned by user_id: exactly one of its partition
    # dirs survives the point predicate
    snap2 = [p for p in plan['kept'].get(t.data_dir + '/snap-2', [])]
    assert all(f'user_id={uid}' in p for p in snap2)
    got = _rows(t.scan(spark, preds))
    exp = _rows(events.filter(F.col('user_id') == uid))
    assert got == exp and len(got) > 0

    et_plan = t.plan_files([('event_type', '=', 'click')])
    snap0 = et_plan['kept'].get(t.data_dir + '/snap-0', [])
    assert snap0 and all('event_type=click' in p for p in snap0)
    got = _rows(t.scan(spark, [('event_type', '=', 'click')]))
    exp = _rows(events.filter(F.col('event_type') == 'click'))
    assert got == exp


def test_schema_evolution_add_column(spark, events, tmp_path):
    """A later append may carry NEW columns: earlier snapshots read them as
    null (Iceberg add-column semantics); stats on the new column exist only
    where the column exists, so predicates on it keep old files
    (conservative) while the residual filter stays exact."""
    t = IcebergishTable(str(tmp_path / 'ev'))
    a = events.filter(F.col('event_id') % 2 == 0)
    b = (events.filter(F.col('event_id') % 2 == 1)
         .withColumn('score', F.round(F.col('value') * 2, 6)))
    t.append(a, partition_by=())
    t.append(b, partition_by=())

    df = t.read(spark)
    assert 'score' in df.columns
    assert df.count() == events.count()
    # old rows: score is null; new rows: exactly value*2
    assert df.filter((F.col('event_id') % 2 == 0)
                     & F.col('score').isNotNull()).count() == 0
    bad = df.filter((F.col('event_id') % 2 == 1)
                    & (F.abs(F.col('score') - F.round(F.col('value') * 2, 6))
                       > 1e-9)).count()
    assert bad == 0

    # scan on the new column: snapshot-0 files carry no 'score' stats ->
    # kept conservatively; result still exact through the residual
    got = sorted(tuple(r) for r in
                 t.scan(spark, [('score', '>=', 0.0)]).select(*COLS).collect())
    exp = _rows(events.filter((F.col('event_id') % 2 == 1)
                              & (F.col('value') * 2 >= 0)))
    assert got == exp


def test_rollback_is_metadata_only_and_forks_lineage(spark, events, tmp_path):
    t = IcebergishTable(str(tmp_path / 'ev'))
    s = [events.filter(F.col('event_id') % 3 == i) for i in range(3)]
    t.append(s[0], partition_by=())
    t.append(s[1], partition_by=())
    t.append(s[2], partition_by=())
    assert t.current_snapshot_id() == 2

    rep = t.rollback(1)
    assert rep == {'rolled_back_to': 1, 'from': 2, 'orphaned': [2]}
    assert t.current_snapshot_id() == 1
    assert _rows(t.read(spark)) == _rows(s[0].unionByName(s[1]))

    # fork: the next append must NOT reuse the orphaned id 2
    snap = t.append(s[2], partition_by=())
    assert snap['snapshot_id'] == 3 and snap['parent'] == 1
    assert _rows(t.read(spark)) == _rows(events)
    # the orphan is no longer reachable from the new lineage
    assert 2 not in t._live_snapshots(t.current_snapshot_id())

    with pytest.raises(ValueError, match='not an ancestor'):
        t.rollback(2)          # orphaned — not in the current lineage
    with pytest.raises(ValueError, match='not an ancestor'):
        t.rollback(99)


def test_rollback_noop_to_current_and_read_old_fork(spark, events, tmp_path):
    t = IcebergishTable(str(tmp_path / 'ev'))
    a = events.filter(F.col('event_id') % 2 == 0)
    b = events.filter(F.col('event_id') % 2 == 1)
    t.append(a, partition_by=())
    t.append(b, partition_by=())
    t.rollback(0)
    # time travel still reads the ORPHANED snapshot explicitly by id
    assert _rows(t.read(spark, 1)) == _rows(events)
    assert _rows(t.read(spark)) == _rows(a)
    rep = t.rollback(t.current_snapshot_id())
    assert rep['orphaned'] == []


def test_snapshot_as_of_timestamp(spark, events, tmp_path):
    t = IcebergishTable(str(tmp_path / 'ev'))
    a = events.filter(F.col('event_id') % 2 == 0)
    b = events.filter(F.col('event_id') % 2 == 1)
    t.append(a, partition_by=())
    ts0 = t.snapshot(0)['timestamp_ms']
    t.append(b, partition_by=())
    ts1 = t.snapshot(1)['timestamp_ms']

    assert t.snapshot_as_of(ts0 - 1) == -1
    assert t.snapshot_as_of(ts0) == 0 if ts1 > ts0 else True
    assert t.snapshot_as_of(ts1) == 1
    assert t.snapshot_as_of(ts1 + 10_000) == 1
    sid = t.snapshot_as_of(ts0)
    if sid == 0:                      # same-ms commits collapse to the later
        assert _rows(t.read(spark, sid)) == _rows(a)


def test_partition_range_predicate_prunes_typed(spark, events, tmp_path):
    """Range ops on an int identity-partition column must prune via TYPED
    comparison of the path value (such files carry no footer stats for the
    column, so this is the only pruning chance) — '9' < '30' lexically
    would be wrong, 9 < 30 typed is right."""
    t = IcebergishTable(str(tmp_path / 'ev'))
    t.append(events, partition_by=('user_id',))
    cut = int(events.agg(F.expr('percentile(user_id, 0.5)')).first()[0])
    plan = t.plan_files([('user_id', '<=', cut)])
    assert 0 < plan['n_kept'] < plan['n_total']
    for paths in plan['kept'].values():
        for p in paths:
            uid = int(p.split('user_id=')[1].split('/')[0])
            assert uid <= cut, p
    got = _rows(t.scan(spark, [('user_id', '<=', cut)]))
    exp = _rows(events.filter(F.col('user_id') <= cut))
    assert got == exp and len(got) > 0


def test_vacuum_reclaims_rollback_orphans(spark, events, tmp_path):
    import os
    t = IcebergishTable(str(tmp_path / 'ev'))
    a = events.filter(F.col('event_id') % 2 == 0)
    b = events.filter(F.col('event_id') % 2 == 1)
    t.append(a, partition_by=())
    t.append(b, partition_by=())
    t.rollback(0)
    t.append(b, partition_by=())            # fork: snapshot 2
    assert os.path.isdir(os.path.join(t.data_dir, 'snap-1'))
    removed = t.vacuum()
    assert removed == [1]                   # the orphaned fork is reclaimed
    assert not os.path.isdir(os.path.join(t.data_dir, 'snap-1'))
    assert _rows(t.read(spark)) == _rows(events)   # live lineage untouched
