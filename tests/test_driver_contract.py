"""Emulates the driver's verify harness: runs entry(), and every queries()
entry; for SQL-oracled queries, compares against DuckDB on the same parquet
(row count + column names + order-insensitive values, exact after the
contract's own rounding)."""
import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = os.environ.get('SPARK_GRAFT_TEST_SF_DIR', '/root/testdata/sf0.001')


def _duck(sf_dir):
    con = duckdb.connect()
    for t in entrymod.TABLES:
        p = f'{sf_dir}/{t}.parquet'
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if np.issubdtype(pdf[c].dtype, np.datetime64):
            pdf[c] = pdf[c].astype('datetime64[us]').astype(str)
        elif pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ['doc_id', 'bucket_start', 'cnt_points', 'sum_value', 'avg_value']


ORACLED = sorted(entrymod.oracle_sql().keys())
ROWS_ONLY = sorted(set(entrymod.queries().keys()) - set(ORACLED))


@pytest.mark.parametrize('name', ORACLED)
def test_query_matches_duckdb_oracle(spark, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    got = _normalize(q(spark, SF_DIR).toPandas())
    con = _duck(SF_DIR)
    exp = _normalize(con.execute(sql).df())
    con.close()
    assert list(got.columns) == list(exp.columns), (list(got.columns), list(exp.columns))
    assert len(got) == len(exp), f'{name}: row count {len(got)} != {len(exp)}'
    for c in got.columns:
        a, b = got[c].to_numpy(), exp[c].to_numpy()
        if np.issubdtype(got[c].dtype, np.floating):
            mism = ~(np.isclose(a, b, rtol=0, atol=0, equal_nan=True))
            assert not mism.any(), f'{name}.{c}: {a[mism][:5]} vs {b[mism][:5]}'
        else:
            assert (a == b).all(), f'{name}.{c}: first diff {a[a != b][:5]} vs {b[a != b][:5]}'


@pytest.mark.parametrize('name', ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    q = entrymod.queries()[name]
    df = q(spark, SF_DIR)
    n = df.count()
    assert n >= 0
    df.limit(5).collect()  # materialize a sample through Arrow
