"""Similarity-search quality (ANN recall vs exact) and text-analysis kernel
tests on the driver fixtures."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from changepoynt_spark.operators import similarity, text


@pytest.fixture(scope='module')
def embeddings(spark, sf_dir):
    df = spark.read.parquet(f'{sf_dir}/embeddings.parquet')
    df = df.withColumn('embedding', F.transform('embedding', lambda x: x.cast('double')))
    df.cache().count()
    return df


@pytest.fixture(scope='module')
def documents(spark, sf_dir):
    df = spark.read.parquet(f'{sf_dir}/documents.parquet')
    df.cache().count()
    return df


def test_exact_topk_matches_numpy(embeddings):
    pdf = embeddings.toPandas()
    mat = np.stack(pdf['embedding'].to_numpy())
    ids = pdf['vec_id'].to_numpy()
    q = mat[ids == 0][0]
    sims = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = [int(i) for i in ids[np.argsort(-np.round(sims, 6))] if i != 0][:10]
    got = similarity.cosine_topk(embeddings.filter('vec_id <> 0'), q, k=10).toPandas()
    assert got['vec_id'].tolist() == order


def test_lsh_topk_recall(embeddings):
    """Bucketed ANN must recover a reasonable share of the exact top-10 while
    scanning a fraction of the corpus (the scale path's contract)."""
    pdf = embeddings.toPandas()
    q = np.stack(pdf[pdf.vec_id == 0]['embedding'].to_numpy())[0]
    exact = set(similarity.cosine_topk(embeddings.filter('vec_id <> 0'), q, k=10)
                .toPandas()['vec_id'])
    single = set(similarity.lsh_bucket_topk(embeddings.filter('vec_id <> 0'), q,
                                            k=10, n_planes=4, n_tables=1)
                 .toPandas()['vec_id'])
    multi = set(similarity.lsh_bucket_topk(embeddings.filter('vec_id <> 0'), q,
                                           k=10, n_planes=4, n_tables=8)
                .toPandas()['vec_id'])
    # near-orthogonal random embeddings: single-table recall is low by
    # theory ((1 - theta/pi)^b); multi-table union must recover it
    assert len(multi & exact) / 10 >= 0.4, f'multi-table recall {len(multi & exact) / 10}'
    assert len(multi & exact) >= len(single & exact)
    sigs = similarity.hyperplane_signatures(embeddings, dim=len(q), n_planes=4)
    bucket_sizes = sigs.groupBy('bucket').count().toPandas()['count']
    assert bucket_sizes.max() < embeddings.count() / 2  # buckets actually split


def test_language_id_deterministic_and_typed(documents):
    a = text.language_id(documents).toPandas().sort_values('doc_id').reset_index(drop=True)
    b = text.language_id(documents).toPandas().sort_values('doc_id').reset_index(drop=True)
    assert (a['lang_pred'] == b['lang_pred']).all()
    assert ((a['lang_conf'] >= 0) & (a['lang_conf'] <= 1)).all()


def test_fingerprints_stable_and_discriminative(documents):
    a = text.fingerprint_documents(documents).toPandas().sort_values('doc_id')
    b = text.fingerprint_documents(documents).toPandas().sort_values('doc_id')
    np.testing.assert_array_equal(a['content_hash'].to_numpy(), b['content_hash'].to_numpy())
    np.testing.assert_array_equal(a['min_shingle_hash'].to_numpy(),
                                  b['min_shingle_hash'].to_numpy())
    # identity channel: unique per distinct text (fixtures have no dup texts)
    assert a['content_hash'].nunique() == len(a)
    # similarity channel: collides across docs sharing their minimal shingle
    assert a['min_shingle_hash'].nunique() < len(a)


def test_tokenize_documents_matches_input_hint_schema(documents):
    toks = text.tokenize_documents(documents)
    assert [f.name for f in toks.schema.fields] == ['doc_id', 'tokens', 'n_tok', 'source']
    row = toks.first()
    assert isinstance(row['doc_id'], str)
    assert all(0 <= t < 50257 for t in row['tokens'][:20])
    assert row['n_tok'] == len(row['tokens'])
