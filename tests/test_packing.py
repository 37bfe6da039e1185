"""Sequence packing + hash-split operators (training-batch assembly)."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from changepoynt_spark.operators import packing
from changepoynt_spark.sources import datagen


@pytest.fixture(scope='module')
def tokens(spark):
    df = datagen.tokens_table(spark, n_docs=60, seed=5, max_len=3000,
                              include_golden=False, partitions=4)
    df.cache().count()
    return df


def test_pack_sequences_invariants(spark, tokens):
    budget = 2048
    packs = packing.pack_sequences(tokens, budget=budget).toPandas()
    all_docs = [d for ids in packs['doc_ids'] for d in ids]
    src = [r['doc_id'] for r in tokens.select('doc_id').collect()]
    assert sorted(all_docs) == sorted(src)          # every doc exactly once
    lens = {r['doc_id']: r['n_tok'] for r in tokens.select('doc_id', 'n_tok').collect()}
    for _, row in packs.iterrows():
        total = sum(lens[d] for d in row['doc_ids'])
        assert total == row['total_tok']
        if not row['oversize']:
            assert total <= budget
        else:
            assert len(row['doc_ids']) == 1 and total > budget
    assert packs['pack_id'].is_unique
    # FFD actually packs: non-oversize packs that aren't the per-partition
    # tail should be reasonably full
    full = packs[~packs['oversize']]
    assert full['fill_ratio'].mean() > 0.5


def test_pack_sequences_respects_budget_partitionwise(spark, tokens):
    packs = packing.pack_sequences(tokens.repartition(8), budget=4096).toPandas()
    assert (packs[~packs['oversize']]['total_tok'] <= 4096).all()
    all_docs = [d for ids in packs['doc_ids'] for d in ids]
    assert len(all_docs) == tokens.count()


def test_split_by_hash_deterministic_and_balanced(spark, tokens):
    a = packing.split_by_hash(tokens, val_pct=20).select('doc_id', 'split').toPandas()
    b = packing.split_by_hash(tokens.repartition(7), val_pct=20) \
               .select('doc_id', 'split').toPandas()
    am = dict(zip(a['doc_id'], a['split']))
    bm = dict(zip(b['doc_id'], b['split']))
    assert am == bm                                  # stable under partitioning
    frac = (a['split'] == 'val').mean()
    assert 0.0 <= frac <= 0.6                        # 60 docs: loose bound
    # growing the corpus never reassigns existing docs
    half = packing.split_by_hash(tokens.limit(30), val_pct=20) \
                  .select('doc_id', 'split').toPandas()
    for d, s in zip(half['doc_id'], half['split']):
        assert am[d] == s


def test_mixture_epochs_counts_and_determinism(spark):
    from changepoynt_spark.operators.packing import mixture_epochs
    rows = [(i, f'src{i % 3}') for i in range(3000)]
    df = spark.createDataFrame(rows, 'doc_id long, source string')
    out = mixture_epochs(df, rates={'src0': 2.5, 'src1': 0.4}).toPandas()
    per = out.groupby('source')['doc_id'].agg(['count', 'nunique'])
    # src0: every doc 2x or 3x -> count/nunique in [2, 3], ~2.5 on average
    assert per.loc['src0', 'nunique'] == 1000
    ratio0 = per.loc['src0', 'count'] / per.loc['src0', 'nunique']
    assert 2.3 < ratio0 < 2.7
    # src1: ~40% of docs kept exactly once
    assert 320 < per.loc['src1', 'nunique'] < 480
    assert per.loc['src1', 'count'] == per.loc['src1', 'nunique']
    # default: everything exactly once
    assert per.loc['src2', 'count'] == per.loc['src2', 'nunique'] == 1000
    # per-doc epochs are 1..n_copies with no gaps
    g = out[out.source == 'src0'].groupby('doc_id')['epoch'].agg(['min', 'max', 'count'])
    assert (g['min'] == 1).all() and (g['max'] == g['count']).all()
    # deterministic
    out2 = mixture_epochs(df, rates={'src0': 2.5, 'src1': 0.4}).toPandas()
    assert sorted(map(tuple, out.values.tolist())) == sorted(map(tuple, out2.values.tolist()))


def test_stratified_sample_exact_counts_and_partition_invariance(spark):
    from changepoynt_spark.operators.packing import stratified_sample_exact
    docs = spark.read.parquet('/root/testdata/sf0.001/documents.parquet')
    out = stratified_sample_exact(docs, ['source', 'lang'], n_per_stratum=3)
    sizes = out.groupBy('source', 'lang').count().toPandas()
    full = docs.groupBy('source', 'lang').count().toPandas() \
        .set_index(['source', 'lang'])['count']
    for _, r in sizes.iterrows():
        expect = min(3, int(full.loc[(r['source'], r['lang'])]))
        assert r['count'] == expect, (r['source'], r['lang'])
    # same strata set as the input
    assert len(sizes) == len(full)
    # deterministic under partitioning
    a = set(out.select('doc_id').toPandas()['doc_id'])
    b = set(stratified_sample_exact(docs.repartition(17), ['source', 'lang'],
                                    n_per_stratum=3)
            .select('doc_id').toPandas()['doc_id'])
    assert a == b
