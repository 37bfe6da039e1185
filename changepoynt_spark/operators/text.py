"""Text analysis over the documents table — the training-data-pipeline
operators a 100 TB corpus needs: tokenization, quality scoring, language ID,
token counting, document fingerprinting.

Everything here that feeds a DuckDB oracle is pure Spark SQL expressions
(whole-stage codegen, no Python); the heuristics that need per-doc numpy
(language ID scoring, rolling-hash fingerprints) are Arrow-batched
mapInPandas.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from changepoynt_spark.sources.datagen import VOCAB

# a small fixed stopword list used by quality scoring and language ID
STOPWORDS = ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'on', 'for', 'with')


def tokenize_documents(df: DataFrame) -> DataFrame:
    """documents -> input-hint tokens table: whitespace split, stable
    word -> int32 id via xxhash64 mod vocab (all JVM-side)."""
    words = F.split(F.col('text'), ' ')
    toks = F.transform(words, lambda w: F.pmod(F.xxhash64(w), F.lit(VOCAB)).cast('int'))
    return df.select(
        F.col('doc_id').cast('string').alias('doc_id'),
        toks.alias('tokens'),
        F.size(words).cast('int').alias('n_tok'),
        'source')


def token_counts(df: DataFrame) -> DataFrame:
    """(doc_id, n_words, n_chars_measured, n_bpe_ish) — whitespace token
    count plus a BPE-ish regex token count (word pieces + digits + punct).
    SQL-expressible -> DuckDB oracle."""
    words = F.split(F.col('text'), ' ')
    bpe = F.regexp_extract_all('text', F.lit(r'([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])'), 1)
    return df.select(
        'doc_id',
        F.size(words).cast('long').alias('n_words'),
        F.length('text').cast('long').alias('n_chars_measured'),
        F.size(bpe).cast('long').alias('n_bpe_ish'))


def quality_stats(df: DataFrame) -> DataFrame:
    """Per-doc quality features: word count, mean word length, stopword
    ratio, punctuation ratio, uppercase ratio.  SQL-expressible."""
    words = F.split(F.col('text'), ' ')
    n_words = F.size(words)
    sw = F.lit(list(STOPWORDS))
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(sw, F.lower(w))))
    n_punct = F.length('text') - F.length(F.regexp_replace('text', r'[^\w\s]', ''))
    return df.select(
        'doc_id',
        n_words.cast('long').alias('n_words'),
        F.round((F.length('text') - n_words + 1) / n_words, 6).alias('avg_word_len'),
        F.round(n_stop / n_words, 6).alias('stopword_ratio'),
        F.round(n_punct / F.length('text'), 6).alias('punct_ratio'))


def language_counts(df: DataFrame) -> DataFrame:
    """Corpus language histogram (smoke-level relational check)."""
    return df.groupBy('lang').agg(F.count('*').alias('n_docs')).orderBy('lang')


_LANGID_SCHEMA = T.StructType([
    T.StructField('doc_id', T.LongType()),
    T.StructField('lang_pred', T.StringType()),
    T.StructField('lang_conf', T.DoubleType()),
])

# tiny per-language character-trigram prior (a deterministic heuristic model;
# real corpora would ship learned tables — same plumbing)
_LANG_TRIGRAMS = {
    'en': ('the', 'and', 'ing', 'ion', 'for'),
    'es': ('que', 'los', 'ade', 'cio', 'ent'),
    'de': ('der', 'ein', 'sch', 'die', 'und'),
    'fr': ('les', 'ent', 'que', 'ion', 'eur'),
    'zh': ('zh_', 'ng_', 'sh_', 'xi_', 'wa_'),
}


def language_id(df: DataFrame) -> DataFrame:
    """Character n-gram language-ID heuristic as an Arrow-batched kernel
    (rows-only check: heuristic output has no SQL oracle)."""

    def kernel(batches):
        langs = list(_LANG_TRIGRAMS)
        for pdf in batches:
            texts = pdf['text'].astype(str)
            scores = np.zeros((len(texts), len(langs)))
            for j, lang in enumerate(langs):
                for tri in _LANG_TRIGRAMS[lang]:
                    scores[:, j] += texts.str.count(tri).to_numpy()
            total = scores.sum(axis=1)
            best = scores.argmax(axis=1)
            conf = np.where(total > 0, scores.max(axis=1) / np.maximum(total, 1), 0.0)
            yield pd.DataFrame({
                'doc_id': pdf['doc_id'],
                'lang_pred': [langs[b] if t > 0 else 'und' for b, t in zip(best, total)],
                'lang_conf': conf,
            })

    return df.select('doc_id', 'text').mapInPandas(kernel, schema=_LANGID_SCHEMA)


_FP_SCHEMA = T.StructType([
    T.StructField('doc_id', T.LongType()),
    T.StructField('content_hash', T.LongType()),
    T.StructField('min_shingle_hash', T.LongType()),
])


def fingerprint_documents(df: DataFrame, window: int = 8, base: int = 257,
                          mod: int = (1 << 61) - 1) -> DataFrame:
    """Rolling-hash (Rabin-Karp) document fingerprints, two channels:

    - ``content_hash``: the rolling hash of the FULL byte stream — an
      identity fingerprint (distinct texts get distinct values w.h.p.),
    - ``min_shingle_hash``: the minimum over all length-``window`` rolling
      hashes (winnowing / minhash-k=1) — a similarity fingerprint that
      deliberately collides for documents sharing their minimal shingle.

    Deterministic; runs as an Arrow-batched kernel."""

    def kernel(batches):
        for pdf in batches:
            content = []
            minsh = []
            for text in pdf['text'].astype(str):
                data = np.frombuffer(text.encode('utf-8'), dtype=np.uint8)
                if len(data) < window:
                    data = np.pad(data, (0, window - len(data)))
                h = 0
                top = pow(base, window - 1, mod)
                full = 0
                for byte in data:
                    full = (full * base + int(byte)) % mod
                n_hashes = len(data) - window + 1
                best = None
                for i in range(window):
                    h = (h * base + int(data[i])) % mod
                best = h
                for i in range(1, n_hashes):
                    h = ((h - int(data[i - 1]) * top) * base + int(data[i + window - 1])) % mod
                    if h < best:
                        best = h
                content.append(full - (1 << 60))
                minsh.append(best - (1 << 60))
            yield pd.DataFrame({'doc_id': pdf['doc_id'], 'content_hash': content,
                                'min_shingle_hash': minsh})

    return df.select('doc_id', 'text').mapInPandas(kernel, schema=_FP_SCHEMA)
