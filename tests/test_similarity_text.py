"""Similarity-search quality (ANN recall vs exact) and text-analysis kernel
tests on the driver fixtures."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from changepoynt_spark.operators import dedup, similarity, text


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


def test_fingerprints_match_frozen_golden_sf001(spark):
    """Vectorized M61 Rabin-Karp == the original per-byte reference kernel,
    bit-for-bit (golden frozen from the original on the sf0.01 corpus)."""
    import os
    g = np.load(os.path.join(os.path.dirname(__file__), 'goldens',
                             'fingerprints_sf001.npz'))
    docs = spark.read.parquet('/root/testdata/sf0.01/documents.parquet')
    got = text.fingerprint_documents(docs).toPandas() \
              .sort_values('doc_id').reset_index(drop=True)
    np.testing.assert_array_equal(got['doc_id'].to_numpy(np.int64), g['doc_id'])
    np.testing.assert_array_equal(got['content_hash'].to_numpy(), g['content_hash'])
    np.testing.assert_array_equal(got['min_shingle_hash'].to_numpy(),
                                  g['min_shingle_hash'])


@pytest.mark.parametrize('sf,max_hamming,bits', [
    ('/root/testdata/sf0.001', 6, 32), ('/root/testdata/sf0.01', 6, 32),
    ('/root/testdata/sf0.001', 3, 32), ('/root/testdata/sf0.001', 6, 64),
    ('/root/testdata/sf0.01', 6, 64),
])
def test_simhash_dup_pairs_recall_is_exactly_one(spark, sf, max_hamming, bits):
    """Pigeonhole banding (max_hamming+1 segments) must find EVERY pair
    within the hamming radius — recall 1.0 against the exhaustive all-pairs
    enumeration (and precision 1.0: the exact verify keeps no others).
    bits=64 is the 100 TB form (9-10 bit band segments)."""
    from changepoynt_spark.operators import dedup
    docs = spark.read.parquet(f'{sf}/documents.parquet')
    sh = dedup.simhash(docs, bits=bits).toPandas()
    ids = sh['doc_id'].to_numpy()
    hs = sh['simhash'].to_numpy(np.int64)
    if bits == 64:  # the high half must actually carry entropy
        assert (np.abs(hs) >= (1 << 32)).any()
    xor = (hs[:, None] ^ hs[None, :]).view(np.uint64)
    ham = np.zeros(xor.shape, dtype=np.int64)
    for b in range(bits):
        ham += ((xor >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
    ia, ib = np.where(np.triu(ham <= max_hamming, k=1))
    truth = {(min(ids[a], ids[b]), max(ids[a], ids[b])) for a, b in zip(ia, ib)}
    got_pdf = dedup.simhash_dup_pairs(docs, max_hamming=max_hamming,
                                      bits=bits).toPandas()
    got = {(min(a, b), max(a, b)) for a, b in zip(got_pdf['doc_a'], got_pdf['doc_b'])}
    assert got == truth, (f'recall {len(got & truth)}/{len(truth)}, '
                          f'{len(got - truth)} spurious')


def test_embedding_cosine_dups_multi_table_recall(spark):
    """Planted near-duplicates: multi-table LSH + exact verify must recover
    >= 0.9 of the brute-force pair set (and never emit a wrong pair)."""
    from changepoynt_spark.operators import similarity
    rng = np.random.default_rng(5)
    vecs = list(rng.standard_normal((120, 64)))
    for i in range(30):   # strong dups, cos ~ 0.99
        vecs.append(vecs[i] + 0.15 * rng.standard_normal(64))
    for i in range(10):   # weaker dups, cos ~ 0.9
        vecs.append(vecs[30 + i] + 0.5 * rng.standard_normal(64))
    mat = np.stack(vecs)
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = np.round(norm @ norm.T, 6)
    ia, ib = np.where(np.triu(cos >= 0.6, k=1))
    truth = set(zip(ia.tolist(), ib.tolist()))
    assert len(truth) >= 35  # the plant worked
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in mat[i]]) for i in range(len(mat))],
        'vec_id long, embedding array<double>')
    got_pdf = similarity.embedding_cosine_dups(df, threshold=0.6,
                                               n_planes=8, n_tables=8).toPandas()
    got = {(min(a, b), max(a, b)) for a, b in zip(got_pdf['vec_a'], got_pdf['vec_b'])}
    assert got <= truth, f'spurious pairs {got - truth}'   # exact verify
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f'recall {recall}'


def test_ivf_topk_full_probe_equals_exact(spark, embeddings):
    """IVF with nprobe == n_lists scans everything — it must return exactly
    the brute-force top-k (the correctness anchor for the pruned path)."""
    from changepoynt_spark.operators import similarity
    pdf = embeddings.toPandas()
    q = np.stack(pdf[pdf.vec_id == 0]['embedding'].to_numpy())[0]
    corpus = embeddings.filter('vec_id <> 0')
    cents = similarity.kmeans_centroids(corpus, k=8, iters=5, seed=7)
    exact = similarity.cosine_topk(corpus, q, k=10).toPandas()
    full = similarity.ivf_topk(corpus, q, cents, k=10, nprobe=len(cents)).toPandas()
    assert full['vec_id'].tolist() == exact['vec_id'].tolist()
    np.testing.assert_array_equal(full['cos_sim'].to_numpy(),
                                  exact['cos_sim'].to_numpy())


def test_ivf_lists_partition_the_corpus(spark, embeddings):
    """Every vector lands in exactly one list and no list hogs the corpus
    (the partition-pruning contract of the IVF layout)."""
    from changepoynt_spark.operators import similarity
    corpus = embeddings.filter('vec_id <> 0')
    cents = similarity.kmeans_centroids(corpus, k=8, iters=5, seed=7)
    assigned = similarity.ivf_assign(corpus, cents)
    sizes = assigned.groupBy('list_id').count().toPandas()
    assert sizes['count'].sum() == corpus.count()
    assert 0 <= sizes['list_id'].min() and sizes['list_id'].max() < len(cents)
    assert sizes['count'].max() < corpus.count()  # quantizer actually splits


def test_ivf_probe_shrinks_candidates_and_keeps_recall(spark, embeddings):
    """nprobe < n_lists must scan a strict subset; recall of the exact top-10
    stays useful (learned centroids, nearest-probe ordering)."""
    from changepoynt_spark.operators import similarity
    pdf = embeddings.toPandas()
    q = np.stack(pdf[pdf.vec_id == 0]['embedding'].to_numpy())[0]
    corpus = embeddings.filter('vec_id <> 0')
    cents = similarity.kmeans_centroids(corpus, k=8, iters=5, seed=7)
    assigned = similarity.ivf_assign(corpus, cents)
    qscore = cents @ q - (cents * cents).sum(axis=1) / 2.0
    probes = [int(i) for i in np.argsort(-qscore)[:2]]
    n_cand = assigned.filter(assigned.list_id.isin(probes)).count()
    assert n_cand < corpus.count() / 2
    exact = set(similarity.cosine_topk(corpus, q, k=10).toPandas()['vec_id'])
    got = set(similarity.ivf_topk(corpus, q, cents, k=10, nprobe=2)
              .toPandas()['vec_id'])
    assert len(got & exact) >= 3  # near-orthogonal corpus: partial by theory


def test_dedup_text_ops_on_degenerate_docs(spark):
    """Empty tables, empty strings and sub-n-gram docs must flow through
    every dedup/text operator without error (a 100 TB corpus WILL contain
    them; slice() on a negative length throws, regression-pinned here)."""
    from changepoynt_spark.operators import dedup
    schema = 'doc_id long, text string, lang string, source string'
    empty = spark.createDataFrame([], schema)
    weird = spark.createDataFrame(
        [(1, '', 'en', 's'), (2, 'word', 'en', 's'), (3, 'a b', 'en', 's'),
         (4, 'just three words', 'en', 's'), (5, 'just three words', 'en', 's')],
        schema)
    for df, label in ((empty, 'empty'), (weird, 'weird')):
        dedup.exact_dup_groups(df).count()
        dedup.ngram_jaccard_pairs(df, df_cap=50).count()
        dedup.simhash_dup_pairs(df, 6).count()
        dedup.minhash_lsh_pairs(df).count()
        text.fingerprint_documents(df).count()
        text.language_id(df).count()
        text.token_counts(df).count()
    # the one 3-word duplicate pair IS found (shingling still works at the
    # exact minimum length)
    pairs = dedup.ngram_jaccard_pairs(weird, df_cap=50).toPandas()
    assert [(a, b) for a, b in zip(pairs['doc_a'], pairs['doc_b'])] == [(4, 5)]


def test_similarity_ops_tolerate_zero_vectors_and_empty_corpus(spark):
    """Zero-norm embeddings (empty docs embed to zeros) must be excluded,
    not crash ANSI division; an empty corpus yields an empty result with a
    stable schema."""
    from changepoynt_spark.operators import similarity
    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(6)]
    rows.append((9, [0.0] * 8))
    df = spark.createDataFrame(rows, 'vec_id long, embedding array<double>')
    q = [1.0] * 8
    topk = similarity.cosine_topk(df, q, k=10).toPandas()
    assert 9 not in set(topk['vec_id'])          # zero vector excluded
    assert len(topk) == 6
    knn = similarity.embedding_knn_pairs(df, query_ids=[0], k=3).toPandas()
    assert 9 not in set(knn['neighbor_id'])
    dups = similarity.embedding_cosine_dups(df, threshold=0.5, n_planes=4,
                                            n_tables=2)
    assert 9 not in set(dups.toPandas().get('vec_a', []))
    empty = spark.createDataFrame([], 'vec_id long, embedding array<double>')
    out = similarity.embedding_cosine_dups(empty, 0.5)
    assert out.count() == 0
    assert out.columns == ['vec_a', 'vec_b', 'cos_sim']
    with pytest.raises(ValueError):
        similarity.cosine_topk(df, [0.0] * 8, k=3)


def test_minhash_band_exchange_carries_no_arrays(spark, documents):
    """The LSH band join must move only (doc_id, band, bh) through its
    exchange — the shingle arrays would otherwise ride the shuffle `bands`
    times each; they are re-attached to the candidate pairs only (VERDICT
    round-1 item 7)."""
    import contextlib
    import io
    import re
    from changepoynt_spark.operators import dedup
    out = dedup.minhash_lsh_pairs(documents, num_hashes=32, bands=8, threshold=0.4,
                                  materialize=False)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode='formatted')
    plan = buf.getvalue()
    band_exchanges = [blk for blk in re.split(r'\n\(', plan)
                      if 'Exchange' in blk.split('\n')[0]
                      and re.search(r'Input \[\d+\]:.*band', blk)]
    assert band_exchanges, 'expected at least one band-keyed exchange'
    for blk in band_exchanges:
        input_line = next(l for l in blk.split('\n') if l.startswith('Input'))
        assert 'shingle' not in input_line and '_sa' not in input_line \
            and '_sb' not in input_line, input_line


def test_dedupe_corpus_end_to_end(spark):
    """Planted exact + near duplicates: dedupe_corpus keeps exactly one
    representative per duplicate group and every unique doc."""
    from changepoynt_spark.operators import dedup
    base = ('the quick brown fox jumps over the lazy dog and runs far away '
            'into the deep green forest tonight')
    near = base.replace('tonight', 'today')          # high-Jaccard neighbor
    uniq = ('completely different words describing an unrelated topic with '
            'no overlap in any shingle at all here')
    rows = [(1, base), (2, base),                     # exact dups
            (3, near),                                # near dup of 1/2
            (4, uniq),
            (5, 'short text under the shingle width')]
    df = spark.createDataFrame(rows, 'doc_id long, text string')
    out = dedup.dedupe_corpus(df, threshold=0.5).toPandas()
    kept = sorted(out['doc_id'])
    assert 2 not in kept                              # exact dup dropped
    assert 3 not in kept                              # near dup dropped
    assert kept == [1, 4, 5]


def test_pii_scrub_counts_and_sequential_redaction(spark):
    from changepoynt_spark.operators.text import pii_scrub
    df = spark.createDataFrame(
        [(1, 'mail a@b.co and c.d+x@e.org, ip 10.0.0.1, tel +1 555 0100 200'),
         (2, ''),                              # empty doc: zero counts, valid hash
         (3, 'no pii here at all')],
        'doc_id long, text string')
    rows = {r['doc_id']: r.asDict() for r in pii_scrub(df).collect()}
    assert rows[1]['n_email'] == 2 and rows[1]['n_ipv4'] == 1 and rows[1]['n_phone'] == 1
    assert rows[2]['n_email'] == rows[2]['n_ipv4'] == rows[2]['n_phone'] == 0
    assert rows[3]['scrubbed_hash'] is not None
    # email digits must not retrigger the phone rule after redaction:
    # scrubbed text of doc 1 equals the hand-redacted form
    import hashlib
    expect = 'mail <EMAIL> and <EMAIL>, ip <IPV4>, tel <PHONE>'
    assert rows[1]['scrubbed_hash'] == hashlib.md5(expect.encode()).hexdigest()


def test_contamination_check_bounds_and_short_docs(spark):
    from changepoynt_spark.operators.text import contamination_check
    df = spark.createDataFrame(
        [(0, 'alpha beta gamma delta'),        # benchmark
         (1, 'alpha beta gamma epsilon'),      # shares 'alpha beta gamma'
         (2, 'zeta eta theta iota'),           # disjoint
         (3, 'too short')],                    # < n words: excluded
        'doc_id long, text string')
    out = {r['doc_id']: r.asDict()
           for r in contamination_check(df, benchmark_ids=[0], n=3).collect()}
    assert set(out) == {1, 2}                  # benchmark + short doc excluded
    assert out[1]['n_hit'] == 1 and out[1]['n_grams'] == 2
    assert out[2]['n_hit'] == 0
    assert 0.0 <= out[1]['hit_ratio'] <= 1.0


def test_mixture_sample_deterministic_and_rate_bounds(spark):
    from changepoynt_spark.operators.packing import mixture_sample
    docs = spark.read.parquet('/root/testdata/sf0.001/documents.parquet')
    rates = {'src0': 1.0, 'src1': 0.0}
    a = sorted(r['doc_id'] for r in mixture_sample(docs, rates, 0.5).collect())
    b = sorted(r['doc_id'] for r in
               mixture_sample(docs.repartition(7), rates, 0.5).collect())
    assert a == b                              # stable under repartitioning
    per_src = {r['source']: r['n'] for r in
               mixture_sample(docs, rates, 0.5)
               .groupBy('source').agg(F.count('*').alias('n')).collect()}
    total = {r['source']: r['n'] for r in
             docs.groupBy('source').agg(F.count('*').alias('n')).collect()}
    assert per_src['src0'] == total['src0']    # rate 1.0 keeps everything
    assert 'src1' not in per_src               # rate 0.0 keeps nothing
    # sampling decision is independent of the train/val split buckets
    from changepoynt_spark.operators.packing import split_by_hash
    kept = mixture_sample(split_by_hash(docs), {'src2': 0.5}, 1.0)
    splits = {r['split'] for r in kept.select('split').distinct().collect()}
    assert splits == {'train', 'val'}


def test_ivf_lists_prune_partitions_on_disk(spark, tmp_path):
    """The IVF scale story is file pruning: embeddings written partitioned
    by list_id mean a probe of nprobe lists READS only nprobe partitions.
    Assert it on disk: the probe query's input files all live under the
    probed list_id directories."""
    import numpy as np
    from pyspark.sql import functions as F
    from changepoynt_spark.operators.similarity import ivf_assign
    import __spark_entry__ as E

    emb = (spark.read.parquet('/root/testdata/sf0.001/embeddings.parquet')
           .withColumn('embedding', F.transform('embedding', lambda x: x.cast('double'))))
    cents = E._ivf_centroids(n_lists=8, dim=64, seed=11)
    out = str(tmp_path / 'ivf_table')
    ivf_assign(emb, cents).write.partitionBy('list_id').parquet(out)

    probes = [0, 3]
    probe_df = spark.read.parquet(out).filter(F.col('list_id').isin(probes))
    # inputFiles() is pre-pruning; input_file_name() reflects what the
    # pruned scan actually reads at runtime
    files = [r[0] for r in
             probe_df.select(F.input_file_name()).distinct().collect()]
    assert files, 'probe read no files'
    assert all(any(f'list_id={p}' in f for p in probes) for f in files), \
        [f for f in files if not any(f'list_id={p}' in f for p in probes)][:3]
    plan = probe_df._jdf.queryExecution().executedPlan().toString()
    assert 'PartitionFilters: [' in plan and 'list_id' in plan.split(
        'PartitionFilters: [', 1)[1][:120]
    # and the probe result equals the unpruned filter (pruning is lossless)
    full = spark.read.parquet(out)
    assert probe_df.count() == full.filter(F.col('list_id').isin(probes)).count() > 0


def test_repeated_passages_finds_planted_repeats_and_tolerates_degenerates(spark):
    from changepoynt_spark.operators import dedup
    schema = 'doc_id long, text string, lang string, source string'
    shared = ' '.join(f'w{i}' for i in range(10))          # one 10-word passage
    rows = [
        (1, 'lead in words ' + shared + ' tail a', 'en', 's'),
        (2, shared + ' completely different ending here', 'en', 's'),
        (3, 'unrelated text with ten distinct words here now ok fine', 'en', 's'),
        (4, '', 'en', 's'),                                 # empty doc
        (5, 'short doc', 'en', 's'),                        # sub-window doc
    ]
    df = spark.createDataFrame(rows, schema)
    rep = dedup.repeated_passages(df, n=10).toPandas()
    # exactly the planted passage repeats across docs 1 and 2
    assert len(rep) == 1
    assert int(rep['n_docs'][0]) == 2
    assert int(rep['n_occurrences'][0]) == 2
    assert int(rep['min_doc_id'][0]) == 1
    # empty table flows through
    assert dedup.repeated_passages(spark.createDataFrame([], schema)).count() == 0


def test_passage_stride_subsamples_but_detects_aligned_repeats(spark):
    from changepoynt_spark.operators import dedup
    schema = 'doc_id long, text string'
    text = ' '.join(f'w{i}' for i in range(20))
    df = spark.createDataFrame([(1, text)], schema)
    full = dedup.passage_hashes(df, n=5, stride=1).count()
    strided = dedup.passage_hashes(df, n=5, stride=2).count()
    assert full == 16            # 20 - 5 + 1 start positions
    assert strided == 8          # every 2nd start position (0-indexed even)
    # identical docs still collide at stride > 1 (windows sampled identically)
    df2 = spark.createDataFrame([(1, text), (2, text)], schema)
    rep = dedup.repeated_passages(df2, n=5, stride=2, id_col='doc_id', text_col='text')
    assert rep.count() == 8


def test_repetition_stats_hand_computed(spark):
    from changepoynt_spark.operators import text as txt
    schema = 'doc_id long, text string'
    rows = [
        # "a b a b a b": top 2-gram "a b" occurs 3x (len 3, text len 11)
        # dup 5-grams: "a b a b a" (pos 0) and "b a b a b" (pos 1) each once
        # -> no duplicated 5-gram -> coverage 0
        (1, 'a b a b a b'),
        # 12 words, "x y z w v" repeated twice back to back: 5-gram
        # "x y z w v" occurs at starts 0 and 5 -> covers positions 0..9
        (2, 'x y z w v x y z w v q r'),
        (3, 'one two'),            # exactly one 2-gram, shorter than n_dup
        (4, 'solo'),               # shorter than every n-gram size
    ]
    rep = (txt.repetition_stats(spark.createDataFrame(rows, schema))
              .toPandas().set_index('doc_id').sort_index())
    assert rep.loc[1, 'top_gram'] == 'a b'
    assert int(rep.loc[1, 'top_gram_cnt']) == 3
    assert rep.loc[1, 'top2gram_char_frac'] == 3 * 3 / 11
    assert rep.loc[1, 'dup5gram_word_frac'] == 0.0
    assert int(rep.loc[2, 'top_gram_cnt']) == 2
    assert rep.loc[2, 'dup5gram_word_frac'] == 10 / 12
    # a 2-word doc yields exactly one 2-gram covering the whole text
    assert rep.loc[3, 'top_gram'] == 'one two'
    assert rep.loc[3, 'top2gram_char_frac'] == 1.0
    assert rep.loc[3, 'dup5gram_word_frac'] == 0.0
    # a 1-word doc has no 2-gram at all -> absent (nothing to rank)
    assert 4 not in rep.index


def test_bm25_search_ranks_term_matches(spark):
    import math
    from changepoynt_spark.operators import text as txt
    schema = 'doc_id long, text string'
    rows = [
        (1, 'spark spark spark alpha beta'),
        (2, 'spark alpha beta gamma delta'),
        (3, 'alpha beta gamma delta epsilon'),
        (4, 'join join alpha beta gamma'),
    ]
    out = (txt.bm25_search(spark.createDataFrame(rows, schema),
                           ['spark', 'join'], k=10).toPandas())
    # docs without any query term are filtered; tf-heavy doc 1 outranks doc 2
    assert set(out['doc_id']) == {1, 2, 4}
    assert list(out['doc_id'])[0] in (1, 4)
    s = dict(zip(out['doc_id'], out['score_bm25']))
    assert s[1] > s[2]
    # hand-check doc 2: tf=1, dl=5, avgdl=5 -> norm term = 1
    # idf = ln((4 - 2 + 0.5)/(2 + 0.5) + 1), score = idf * 1 * 2.2 / (1 + 1.2)
    idf = math.log((4 - 2 + 0.5) / (2 + 0.5) + 1)
    assert abs(s[2] - round(idf * 2.2 / 2.2, 6)) < 1e-9


def test_bm25_empty_and_absent_term(spark):
    from changepoynt_spark.operators import text as txt
    schema = 'doc_id long, text string'
    df = spark.createDataFrame([(1, 'alpha beta'), (2, '')], schema)
    # no doc contains the term -> empty result, no div-by-zero on empty text
    assert txt.bm25_search(df, ['zzz'], k=5).count() == 0


def test_bm25_plan_scans_corpus_once_no_explode(spark):
    from changepoynt_spark.operators import text as txt
    schema = 'doc_id long, text string'
    df = spark.createDataFrame([(1, 'spark alpha'), (2, 'join beta')], schema)
    out = txt.bm25_search(df, ['spark', 'join'], k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # tf is a row-local array_filter size: the doc side is never exploded,
    # and the single stats row comes back via a broadcast join
    assert 'Generate' not in plan          # no explode anywhere
    assert 'BroadcastExchange' in plan     # stats row broadcast, not shuffled
    assert plan.count('Scan ExistingRDD') + plan.count('Scan parquet') <= 2


def test_lexical_diversity_broadcasts_hapax_set(spark):
    from changepoynt_spark.operators import text as txt
    schema = 'doc_id long, text string'
    df = spark.createDataFrame([(1, 'a b c a'), (2, 'c d e')], schema)
    out = txt.lexical_diversity(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert 'BroadcastHashJoin' in plan     # hapax set joins map-side
    pdf = out.toPandas().set_index('doc_id')
    # corpus counts: a=2 b=1 c=2 d=1 e=1 -> hapax {b, d, e}
    assert int(pdf.loc[1, 'n_hapax']) == 1 and int(pdf.loc[2, 'n_hapax']) == 2
    assert pdf.loc[1, 'ttr'] == 3 / 4 and pdf.loc[2, 'ttr'] == 1.0


def test_hash_embed_deterministic_unit_norm_and_signal(spark):
    from changepoynt_spark.operators import text as txt
    schema = 'doc_id long, text string'
    df = spark.createDataFrame(
        [(1, 'alpha beta gamma alpha'), (2, 'alpha beta gamma alpha'),
         (3, 'totally different words here'), (4, '')], schema)
    emb = txt.hash_embed(df, dim=16).toPandas().set_index('doc_id')
    import numpy as np
    v1 = np.array(emb.loc[1, 'embedding'])
    v2 = np.array(emb.loc[2, 'embedding'])
    v3 = np.array(emb.loc[3, 'embedding'])
    np.testing.assert_array_equal(v1, v2)          # identical text -> identical vector
    assert abs(float(np.linalg.norm(v1)) - 1.0) < 1e-12
    assert float(v1 @ v3) < 0.9                    # different text separates
    # empty doc: one '' token still hashes -> norm 1; never NaN
    assert not np.isnan(np.array(emb.loc[4, 'embedding'])).any()


def test_heavy_hitters_equals_naive_topk(spark, documents):
    from changepoynt_spark.operators.frequent import heavy_hitters
    words = documents.select(F.explode(F.split('text', ' ')).alias('w'))
    got = heavy_hitters(words, 'w', k=20, candidate_k=256).toPandas()
    want = (words.groupBy('w').agg(F.count('*').alias('cnt'))
                 .orderBy(F.col('cnt').desc(), 'w').limit(20)
                 .toPandas().rename(columns={'w': 'item'}))
    assert got['item'].tolist() == want['item'].tolist()
    assert got['cnt'].tolist() == want['cnt'].tolist()
    # the exchange after pruning carries only candidates (superset of top-k)
    assert len(got) == 20


@pytest.mark.parametrize('seed', [0, 1])
def test_dup_clusters_star_matches_union_find(spark, seed):
    import numpy as np
    from changepoynt_spark.operators import dedup
    rng = np.random.default_rng(seed)
    edges = {tuple(sorted((int(a), int(b))))
             for a, b in rng.integers(0, 80, size=(60, 2)) if a != b}
    # a long chain: diameter >> log rounds — the case star-CC exists for
    chain = [(100 + i, 101 + i) for i in range(30)]
    edges |= set(chain)
    # union-find ground truth
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth = {n: find(n) for n in parent}

    df = spark.createDataFrame(sorted(edges), 'doc_a long, doc_b long')
    got = {r['doc_id']: r['cluster_id']
           for r in dedup.dup_clusters_star(df, max_iterations=15).collect()}
    assert got == truth
    # agrees with the min-label propagation path too
    prop = {r['doc_id']: r['cluster_id']
            for r in dedup.dup_clusters(df, max_iterations=60).collect()}
    assert got == prop


def test_bm25_from_index_equals_scan_path(spark, documents):
    from changepoynt_spark.operators import text as txt
    terms = ['spark', 'join', 'window', 'stream']
    scan = txt.bm25_search(documents, terms, k=20).toPandas()
    index = txt.build_inverted_index(documents)
    dl = documents.select('doc_id', F.size(F.split('text', ' ')).alias('dl'))
    idx = txt.bm25_from_index(index, dl, terms, k=20).toPandas()
    assert scan['doc_id'].tolist() == idx['doc_id'].tolist()
    assert scan['score_bm25'].tolist() == idx['score_bm25'].tolist()
    assert scan['n_words'].tolist() == idx['n_words'].tolist()


def test_chunk_documents_windows_and_edges(spark):
    from changepoynt_spark.operators import text as txt
    words = ' '.join(f'w{i}' for i in range(250))
    df = spark.createDataFrame([(1, words), (2, 'short doc only')],
                               'doc_id long, text string')
    out = (txt.chunk_documents(df, chunk_words=100, overlap=20)
              .toPandas().sort_values(['doc_id', 'chunk_id']))
    d1 = out[out.doc_id == 1]
    # stride 80: starts at 0, 80, 160 -> 3 chunks (240..249 covered by last)
    assert d1['chunk_id'].tolist() == [0, 1, 2]
    assert d1['n_words'].tolist() == [100, 100, 90]
    first = d1.iloc[0]['chunk_text'].split(' ')
    second = d1.iloc[1]['chunk_text'].split(' ')
    assert first[80:] == second[:20]          # exact overlap
    assert first[0] == 'w0' and second[0] == 'w80'
    # short doc: one whole chunk
    d2 = out[out.doc_id == 2]
    assert len(d2) == 1 and d2.iloc[0]['chunk_text'] == 'short doc only'
    # coverage: every word appears in some chunk
    covered = set(w for t in d1['chunk_text'] for w in t.split(' '))
    assert covered == set(words.split(' '))


def test_quantized_topk_recall_and_integer_determinism(spark, embeddings):
    from changepoynt_spark.operators import similarity
    q = similarity.quantize_embeddings(embeddings.filter('vec_id <> 0'))
    qrow = similarity.quantize_embeddings(embeddings.filter('vec_id = 0')) \
        .select('qvec').first()[0]
    got = similarity.quantized_topk(q, qrow, k=10).toPandas()
    pdfq = embeddings.filter('vec_id = 0').select('embedding').first()[0]
    exact = similarity.cosine_topk(embeddings.filter('vec_id <> 0'), pdfq,
                                   k=10).toPandas()
    overlap = len(set(got['vec_id']) & set(exact['vec_id'])) / 10
    assert overlap >= 0.6, f'int8 recall {overlap}'     # 1/127 error budget
    # int8 range respected; zero vectors dropped, never NaN
    import numpy as np
    qv = np.array(q.select('qvec').first()[0])
    assert qv.min() >= -127 and qv.max() <= 127 and np.abs(qv).max() == 127
    got2 = similarity.quantized_topk(q, qrow, k=10).toPandas()
    assert got['vec_id'].tolist() == got2['vec_id'].tolist()


def test_quality_score_linear_matches_numpy(spark):
    """Learned quality filter == driver-side numpy computation of the same
    hashed-linear model (md5 buckets, micro-unit integer sums, sigmoid)."""
    import hashlib
    from changepoynt_spark.operators.text import quality_score_linear

    rng = np.random.default_rng(5)
    weights = list(rng.standard_normal(64))
    rows = [(1, 'alpha beta gamma alpha'), (2, 'delta'),
            (3, 'x y z w q r s t u v'), (4, 'alpha alpha alpha')]
    df = spark.createDataFrame(rows, 'doc_id long, text string')
    got = quality_score_linear(df, weights, bias=0.25, threshold=0.6) \
        .toPandas().set_index('doc_id').sort_index()

    wq = np.array([int(round(w * 1_000_000)) for w in weights], dtype=np.int64)
    for doc_id, text in rows:
        words = text.split(' ')
        bks = [int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 64 for w in words]
        z = 0.25 + (float(wq[bks].sum()) / 1_000_000.0) / len(words)
        score = round(1.0 / (1.0 + np.exp(-z)), 6)
        assert got.loc[doc_id, 'n_words'] == len(words)
        assert got.loc[doc_id, 'quality_score'] == pytest.approx(score, abs=1e-9)
        assert bool(got.loc[doc_id, 'keep']) == (got.loc[doc_id, 'quality_score'] >= 0.6)


def test_embedding_contamination_matches_bruteforce(spark):
    from changepoynt_spark.operators.similarity import embedding_contamination
    emb = spark.read.parquet('/root/testdata/sf0.001/embeddings.parquet')
    emb = emb.withColumn('embedding',
                         F.transform('embedding', lambda x: x.cast('double')))
    got = embedding_contamination(emb, benchmark_ids=[0, 1, 2], threshold=0.25) \
        .toPandas().set_index('vec_id')
    pdf = emb.toPandas()
    vecs = {int(r['vec_id']): np.asarray(r['embedding'], dtype=float)
            for _, r in pdf.iterrows()}
    bench = [vecs[i] / np.linalg.norm(vecs[i]) for i in (0, 1, 2)]
    checked = 0
    for vid, v in vecs.items():
        if vid in (0, 1, 2) or np.linalg.norm(v) == 0:
            continue
        m = max(float(np.dot(v / np.linalg.norm(v), b)) for b in bench)
        assert got.loc[vid, 'max_benchmark_cos'] == pytest.approx(m, abs=2e-6)
        assert bool(got.loc[vid, 'contaminated']) == \
            (got.loc[vid, 'max_benchmark_cos'] >= 0.25)
        checked += 1
    assert checked > 400


def test_kmeans_sample_deterministic_and_sortless(spark, embeddings):
    """Round-5: the k-means sample must be (a) partition-invariant — same
    centroids no matter how the corpus is partitioned — and (b) free of any
    global Sort (rangepartitioning) stage; only a hash exchange + per-bucket
    local sort is allowed."""
    corpus = embeddings.filter('vec_id <> 0')
    c1 = similarity.kmeans_centroids(corpus, k=8, iters=5, seed=7, sample=200)
    c2 = similarity.kmeans_centroids(corpus.repartition(13), k=8, iters=5,
                                     seed=7, sample=200)
    np.testing.assert_array_equal(c1, c2)

    plan = similarity.deterministic_sample(
        corpus.select('vec_id', 'embedding'), 200, 'vec_id') \
        ._jdf.queryExecution().executedPlan().toString()
    assert 'rangepartitioning' not in plan.lower(), plan
    assert 'hashpartitioning' in plan.lower(), plan


def test_embedding_contamination_empty_benchmark(spark, embeddings):
    """Round-5 ADVICE fix: benchmark_ids matching no rows must keep every
    corpus row with NULL max cosine and contaminated=false, not silently
    return an empty frame."""
    corpus = embeddings.filter('vec_id <> 0')
    got = similarity.embedding_contamination(
        corpus, benchmark_ids=[-999, -998], threshold=0.5).toPandas()
    n = corpus.filter(
        F.aggregate(F.transform('embedding', lambda x: x * x),
                    F.lit(0.0), lambda a, v: a + v) > 0).count()
    assert len(got) == n
    assert got['max_benchmark_cos'].isna().all()
    assert not got['contaminated'].any()


def test_unigram_logprob_tiny_corpus(spark):
    """Hand-checked unigram LM: logprobs under the corpus's own word
    distribution, per-word round-6 quantization then exact decimal sums."""
    import math
    docs = [(1, 'a a b'), (2, 'a c')]
    df = spark.createDataFrame(docs, 'doc_id long, text string')
    got = text.unigram_logprob(df).orderBy('doc_id').toPandas()
    # corpus: a:3 b:1 c:1, N=5
    lp = {w: round(math.log(c) - math.log(5), 6) for w, c in
          {'a': 3, 'b': 1, 'c': 1}.items()}
    exp1 = (2 * lp['a'] + lp['b']) / 3
    exp2 = (lp['a'] + lp['c']) / 2
    assert got['n_words'].tolist() == [3, 2]
    assert got['avg_logprob'].iloc[0] == pytest.approx(exp1, abs=1e-6)
    assert got['avg_logprob'].iloc[1] == pytest.approx(exp2, abs=1e-6)
    assert got['perplexity'].iloc[0] == pytest.approx(math.exp(-exp1), abs=1e-4)
    # doc 2 contains the rare word c -> higher perplexity than doc 1? both
    # have one rare word; doc 1 amortizes it over more high-prob tokens
    assert got['perplexity'].iloc[0] < got['perplexity'].iloc[1]


def test_unigram_logprob_partition_invariance(spark):
    """Exact decimal per-doc sums: identical output under any input
    partitioning."""
    rng = np.random.default_rng(5)
    vocab = ['tok%d' % i for i in range(30)]
    docs = [(i, ' '.join(rng.choice(vocab, size=int(rng.integers(3, 40)))))
            for i in range(40)]
    df = spark.createDataFrame(docs, 'doc_id long, text string')
    a = text.unigram_logprob(df.coalesce(1)).orderBy('doc_id').toPandas()
    b = text.unigram_logprob(df.repartition(8)).orderBy('doc_id').toPandas()
    assert a.astype(str).equals(b.astype(str))


def test_dsir_importance_separates_target_domain(spark):
    """Docs whose word mix matches the target slice up-weight (weight > 1);
    off-domain docs down-weight — and the log weights are recomputable in
    pure python with the same smoothing."""
    import math
    docs = ([(i, ' '.join(['alpha', 'beta', 'gamma'] * 5), 'tgt')
             for i in range(5)]
            + [(i + 5, ' '.join(['delta', 'epsilon', 'zeta'] * 5), 'other')
               for i in range(5)])
    df = spark.createDataFrame(docs, 'doc_id long, text string, source string')
    got = (text.dsir_importance(df, ('tgt',), dim=64)
           .orderBy('doc_id').toPandas())
    assert (got['weight'][:5] > 1.0).all()       # target-domain words
    assert (got['weight'][5:] < 1.0).all()       # off-domain words
    # python recomputation for one bucketed word requires the same md5
    # bucketing; instead verify the aggregate identity: total target mass
    # n_feats is words per doc
    assert got['n_feats'].tolist() == [15] * 10
    # weights are exp(avg_logweight) under round-6
    import numpy as np
    assert np.allclose(got['weight'], np.exp(got['avg_logweight']), atol=1e-4)


def test_dsir_importance_partition_invariance(spark):
    rng = np.random.default_rng(17)
    vocab = ['w%d' % i for i in range(40)]
    docs = [(i, ' '.join(rng.choice(vocab, size=int(rng.integers(5, 30)))),
             'src%d' % int(rng.integers(0, 4))) for i in range(60)]
    df = spark.createDataFrame(docs, 'doc_id long, text string, source string')
    a = (text.dsir_importance(df.coalesce(1), ('src0',), dim=32)
         .orderBy('doc_id').toPandas())
    b = (text.dsir_importance(df.repartition(8), ('src0',), dim=32)
         .orderBy('doc_id').toPandas())
    assert a.astype(str).equals(b.astype(str))


def test_dedup_ranges_planted_span_exact_boundaries(spark):
    """Lee-2022 exact-substring dedup: a 200-word span planted into 3 docs
    at different offsets is recovered with EXACT word boundaries in every
    host doc; private text contributes no range."""
    rng = np.random.default_rng(41)

    def noise(k, tag):
        return [f'{tag}{rng.integers(0, 10 ** 9)}' for _ in range(k)]

    span = [f'shared{i}' for i in range(200)]
    docs = []
    offsets = {'d1': 17, 'd2': 0, 'd3': 333}
    for doc, off in offsets.items():
        words = noise(off, doc) + span + noise(50, doc + 'tail')
        docs.append((doc, ' '.join(words)))
    # a 4th doc with no shared content
    docs.append(('d4', ' '.join(noise(300, 'private'))))
    df = spark.createDataFrame(docs, 'doc_id string, text string')
    got = (dedup.dedup_ranges(df, n=10, min_docs=2)
           .orderBy('doc_id', 'range_start').toPandas())
    assert got['doc_id'].tolist() == ['d1', 'd2', 'd3']
    for _, r in got.iterrows():
        off = offsets[r['doc_id']]
        assert r['range_start'] == off + 1           # 1-based inclusive
        assert r['range_end'] == off + 200
        assert r['n_positions'] == 200
        assert r['n_windows'] == 200 - 10 + 1        # solid coverage


def test_dedup_ranges_merges_overlap_and_respects_floor(spark):
    """Two planted spans that OVERLAP in one doc merge into a single
    maximal range; a shared span shorter than n stays below the resolution
    floor and emits nothing."""
    a = [f'alpha{i}' for i in range(30)]
    b = [f'beta{i}' for i in range(30)]
    short = [f'tiny{i}' for i in range(8)]          # < n=10
    rng = np.random.default_rng(43)
    noise = lambda k, t: [f'{t}{rng.integers(0, 10 ** 9)}' for _ in range(k)]
    # host: a at 1..30, b at 21..50 (overlap 21..30) -> one range 1..50
    host = a[:20] + a[20:] + b[10:]
    assert host == a + b[10:]
    docs = [
        ('h', ' '.join(host + noise(20, 'h'))),
        ('pa', ' '.join(noise(5, 'pa') + a + noise(5, 'paz'))),
        ('pb', ' '.join(noise(9, 'pb') + b + noise(9, 'pbz'))),
        ('s1', ' '.join(noise(40, 's1') + short + noise(40, 's1z'))),
        ('s2', ' '.join(noise(40, 's2') + short + noise(40, 's2z'))),
    ]
    df = spark.createDataFrame(docs, 'doc_id string, text string')
    got = (dedup.dedup_ranges(df, n=10, min_docs=2)
           .orderBy('doc_id', 'range_start').toPandas())
    by_doc = {d: g for d, g in got.groupby('doc_id')}
    # the short shared span emits nothing anywhere
    assert 's1' not in by_doc and 's2' not in by_doc
    # host: a covers 1..30, b covers 21..50 -> merged maximal range 1..50
    h = by_doc['h']
    assert len(h) == 1
    assert (h.iloc[0]['range_start'], h.iloc[0]['range_end']) == (1, 50)
    # donors recover their own spans exactly
    pa = by_doc['pa'].iloc[0]
    assert (pa['range_start'], pa['range_end']) == (6, 35)
    # pb's SHARED portion is only b[10:] (the host never saw b[:10]), which
    # sits at pb positions 20..39 — the operator reports shared ranges, not
    # the donor's whole span
    pb = by_doc['pb'].iloc[0]
    assert (pb['range_start'], pb['range_end']) == (20, 39)


def test_dedup_ranges_partition_invariance_and_guard(spark):
    """Ranges are a pure function of the corpus — identical under any input
    partitioning; min_docs < 2 is rejected (within-doc repeats are
    repetition_stats' job, not cross-doc dedup)."""
    rng = np.random.default_rng(47)
    span = [f's{i}' for i in range(25)]
    docs = [(f'd{j}', ' '.join(
        [f'n{j}_{rng.integers(0, 10 ** 9)}' for _ in range(j * 3)] + span))
        for j in range(6)]
    df = spark.createDataFrame(docs, 'doc_id string, text string')
    one = (dedup.dedup_ranges(df.coalesce(1), n=10, min_docs=2)
           .orderBy('doc_id', 'range_start').toPandas())
    eight = (dedup.dedup_ranges(df.repartition(8), n=10, min_docs=2)
             .orderBy('doc_id', 'range_start').toPandas())
    assert one.equals(eight)
    assert len(one) == 6
    with pytest.raises(ValueError):
        dedup.dedup_ranges(df, n=10, min_docs=1)


def test_lsh_topk_duplicate_ids_deterministic(spark, embeddings):
    """ADVICE r6: a duplicate id carrying DIFFERENT vectors must survive
    candidate dedup deterministically (max_by on the vector hash), so the
    top-k set and scores are identical across runs and physical plans —
    and one id never consumes two top-k slots."""
    from pyspark.sql import functions as F
    pdf = embeddings.toPandas()
    q = np.stack(pdf[pdf.vec_id == 0]['embedding'].to_numpy())[0]
    base = embeddings.filter('vec_id <> 0')
    # clone every row under the SAME id with a perturbed vector
    clone = base.withColumn(
        'embedding', F.transform('embedding', lambda x: x * F.lit(0.5)))
    dup = base.unionByName(clone)
    runs = []
    for part in (1, 7, 32):
        out = (similarity.lsh_bucket_topk(dup.repartition(part), q, k=10,
                                          n_planes=4, n_tables=8)
               .toPandas())
        assert out['vec_id'].is_unique
        runs.append(list(zip(out['vec_id'], out['cos_sim'].round(6))))
    assert runs[0] == runs[1] == runs[2]


def test_decontaminate_ranges_planted_leak_exact_boundaries(spark):
    """r8 exact-substring DECONTAMINATION: a benchmark passage leaked
    verbatim into corpus docs is recovered with exact word boundaries;
    clean corpus docs and corpus-internal duplication (not in the
    benchmark) contribute NO range; sub-floor leaks (< n words) are below
    resolution, as in dedup_ranges."""
    rng = np.random.default_rng(43)

    def noise(k, tag):
        return [f'{tag}{rng.integers(0, 10 ** 9)}' for _ in range(k)]

    leak = [f'bench{i}' for i in range(60)]
    shared_private = [f'dupe{i}' for i in range(40)]   # corpus-internal dup
    bench = [('b1', ' '.join(noise(20, 'bpre') + leak + noise(20, 'bpost')))]
    offsets = {'c1': 5, 'c2': 100}
    corpus = []
    for doc, off in offsets.items():
        corpus.append((doc, ' '.join(
            noise(off, doc) + leak + shared_private + noise(30, doc + 't'))))
    corpus.append(('c3', ' '.join(noise(25, 'c3a') + shared_private
                                  + noise(25, 'c3b'))))        # dup only
    corpus.append(('c4', ' '.join(noise(15, 'c4') + leak[:9]
                                  + noise(40, 'c4t'))))        # sub-floor
    cdf = spark.createDataFrame(corpus, 'doc_id string, text string')
    bdf = spark.createDataFrame(bench, 'doc_id string, text string')
    got = (dedup.decontaminate_ranges(cdf, bdf, n=10)
           .orderBy('doc_id', 'range_start').toPandas())
    assert got['doc_id'].tolist() == ['c1', 'c2']
    for _, r in got.iterrows():
        off = offsets[r['doc_id']]
        assert r['range_start'] == off + 1
        assert r['range_end'] == off + 60
        assert r['n_positions'] == 60
        assert r['n_windows'] == 60 - 10 + 1

    # the benchmark-side hash set rides a BROADCAST semi join (the corpus
    # must never shuffle against the benchmark at 100 TB)
    plan = dedup.decontaminate_ranges(cdf, bdf, n=10)._jdf.queryExecution() \
        .executedPlan().toString()
    assert 'BroadcastHashJoin' in plan and 'LeftSemi' in plan


def test_excise_ranges_scrubs_exactly_the_leaked_words(spark):
    """r8 scrub step: excise_ranges removes precisely the covered word
    positions, keeps relative order, passes clean docs through
    BYTE-identical (no split/rejoin round trip), and a fully-covered doc
    excises to the empty string."""
    docs = spark.createDataFrame(
        [('a', 'w1 w2 w3 w4 w5 w6 w7 w8'),
         ('b', 'keep  double  spaces intact'),      # clean: verbatim out
         ('c', 'x1 x2 x3')],
        'doc_id string, text string')
    ranges = spark.createDataFrame(
        [('a', 3, 5, 3, 1), ('a', 7, 7, 1, 1), ('c', 1, 3, 3, 1)],
        'doc_id string, range_start long, range_end long, '
        'n_positions long, n_windows long')
    got = {r['doc_id']: r for r in
           dedup.excise_ranges(docs, ranges).collect()}
    assert got['a']['clean_text'] == 'w1 w2 w6 w8'
    assert got['a']['n_words_removed'] == 4 and got['a']['n_ranges'] == 2
    assert got['b']['clean_text'] == 'keep  double  spaces intact'
    assert got['b']['n_words_removed'] == 0 and got['b']['n_ranges'] == 0
    assert got['c']['clean_text'] == ''
    assert got['c']['n_words_removed'] == 3

    # composed end-to-end: excising the decontaminate_ranges output leaves
    # NO residual contamination (a second pass finds nothing)
    rng = np.random.default_rng(47)
    noise = lambda k, t: [f'{t}{rng.integers(0, 10 ** 9)}' for _ in range(k)]
    leak = [f'bench{i}' for i in range(30)]
    bdf = spark.createDataFrame(
        [('b1', ' '.join(noise(10, 'bp') + leak))],
        'doc_id string, text string')
    cdf = spark.createDataFrame(
        [('c1', ' '.join(noise(20, 'c1') + leak + noise(20, 'c1t')))],
        'doc_id string, text string')
    ranges2 = dedup.decontaminate_ranges(cdf, bdf, n=10)
    clean = (dedup.excise_ranges(cdf, ranges2)
             .select('doc_id', F.col('clean_text').alias('text')))
    assert dedup.decontaminate_ranges(clean, bdf, n=10).count() == 0
