"""Physical-plan assertions: the plans we designed for are the plans we get
(broadcast joins for small dims, pushed filters, pruned columns)."""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_nation_revenue_broadcasts_dims(spark, sf_dir):
    df = entrymod.queries()['nation_revenue'](spark, sf_dir)
    plan = _plan(df)
    assert 'BroadcastHashJoin' in plan, plan
    assert 'SortMergeJoin' not in plan, 'small dims must broadcast, not sort-merge'


def test_lineitem_q1_pushes_shipdate_filter(spark, sf_dir):
    df = entrymod.queries()['lineitem_pricing_summary'](spark, sf_dir)
    plan = _plan(df)
    assert 'PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate' in plan, plan


def test_q1_scan_prunes_columns(spark, sf_dir):
    df = entrymod.queries()['lineitem_pricing_summary'](spark, sf_dir)
    plan = _plan(df)
    # ReadSchema must not include the join keys / unused columns
    read = [l for l in plan.splitlines() if 'ReadSchema' in l][0]
    assert 'l_orderkey' not in read and 'l_partkey' not in read, read
    assert 'l_quantity' in read and 'l_returnflag' in read


def test_embedding_topk_uses_take_ordered(spark, sf_dir):
    df = entrymod.queries()['embedding_topk_cosine'](spark, sf_dir)
    plan = _plan(df)
    assert 'TakeOrderedAndProject' in plan, 'top-k must not be a full sort\n' + plan


def test_scans_prune_columns_to_projection(spark, sf_dir):
    """ReadSchema asserts: operators must push column pruning into the
    parquet scan — reading all columns for a narrow projection is wrong."""
    import re
    from changepoynt_spark.operators import text as txt
    from changepoynt_spark.operators.rollup import rollup_from_points

    def read_schema(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        m = re.search(r'ReadSchema: struct<([^>]*)>', plan)
        assert m, plan
        return {c.split(':')[0] for c in m.group(1).split(',') if c}

    docs = spark.read.parquet(f'{sf_dir}/documents.parquet')
    # tokenize touches doc_id/text/source — lang and n_chars must be pruned
    cols = read_schema(txt.tokenize_documents(docs))
    assert cols == {'doc_id', 'text', 'source'}, cols

    ev = spark.read.parquet(f'{sf_dir}/events.parquet')
    tier = rollup_from_points(ev, ['user_id'], interval='1 hour')
    cols = read_schema(tier)
    assert cols == {'user_id', 'ts', 'value'}, cols

    # quality stats needs only doc_id/text
    cols = read_schema(txt.quality_stats(docs))
    assert cols == {'doc_id', 'text'}, cols
