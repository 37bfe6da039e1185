"""Partitioning / skew planning for the scoring UDF.

Kernel cost is linear in series length (the reference's own runtime model,
/root/reference/changepoynt/algorithms/base_algorithm.py:52-114), and
Catalyst/AQE cannot see inside a Python UDF — so skew from heavy-tail
sequence lengths must be defused explicitly (north rule):

1. :func:`salted_repartition` — spread docs by xxhash64(source, doc_id) plus
   a cost-weighted salt so the expected per-partition token count (not row
   count) is balanced.
2. :func:`chunk_series` / :func:`reassemble_chunked_scores` — split sequences
   longer than ``max_len`` into overlapping chunks with a halo of
   ``min_required_length`` samples on each side, score chunks independently,
   then keep each position's score from the chunk that owns it.  Chunk
   slicing uses native ``F.slice`` (JVM-side, no Python).

NOTE: chunked scoring of RNG-feedback methods (e.g. SST 'ika') is not
bit-identical to unchunked scoring — chunks restart the seed/feedback chain.
Deterministic local kernels (moving_window, zero) chunk exactly; golden
carriers are short and never chunked.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(df: DataFrame, num_partitions: int, cost_col: str = 'n_tok',
                       chunk_cost: int = 20_000) -> DataFrame:
    """Repartition so long docs do not pile into one task.

    Docs are hashed uniformly; docs whose cost exceeds ``chunk_cost`` get a
    per-row salt drawn from their own hash modulo ceil(cost/chunk_cost) so
    consecutive heavy docs scatter (they are still single rows — use
    :func:`chunk_series` to split the work itself)."""
    salt = (F.xxhash64('doc_id', F.lit(1)) %
            F.greatest(F.lit(1), F.ceil(F.col(cost_col) / chunk_cost))).cast('int')
    return df.repartition(num_partitions, F.xxhash64('source', 'doc_id') + salt)


def chunk_series(df: DataFrame, max_len: int, halo: int,
                 tokens_col: str = 'tokens') -> DataFrame:
    """Explode rows with n_tok > max_len + 2*halo into overlapping chunks.

    Output adds: ``chunk_idx`` (0-based), ``chunk_lo`` (global position of
    the chunk's first token) and ``valid_from``/``valid_to`` (global position
    range [valid_from, valid_to) whose scores this chunk owns).  Short rows
    pass through as a single chunk.  All slicing is native Spark SQL.
    """
    n_chunks = F.greatest(F.lit(1), F.ceil(F.col('n_tok') / max_len)).cast('int')
    df = df.withColumn('_n_chunks', n_chunks)
    df = df.withColumn('chunk_idx', F.explode(F.sequence(F.lit(0), F.col('_n_chunks') - 1)))
    chunk_s = F.col('chunk_idx') * max_len                     # owned range start
    chunk_e = F.least(F.col('n_tok'), (F.col('chunk_idx') + 1) * F.lit(max_len))
    lo = F.greatest(F.lit(0), chunk_s - halo)                  # physical slice start
    hi = F.least(F.col('n_tok'), chunk_e + halo)
    return (df.withColumn('valid_from', chunk_s)
              .withColumn('valid_to', chunk_e)
              .withColumn('chunk_lo', lo)
              .withColumn(tokens_col, F.slice(F.col(tokens_col), lo + 1, hi - lo))
              .withColumn('n_tok', F.size(tokens_col))
              .drop('_n_chunks'))


def score_series_chunked(df: DataFrame, algorithm: str, params: dict = None,
                         max_len: int = 100_000, num_partitions: int = None) -> DataFrame:
    """Convenience composition for heavy-tailed inputs: cost-salted
    repartition -> chunk-with-halo -> shuffle-free scoring -> reassembled
    long-format scores (doc_id, source, pos, score).

    The halo is the algorithm's minimum covered region, so every owned
    position of a chunk sees the full context it needs.  Deterministic local
    kernels reproduce unchunked scores exactly; RNG-feedback kernels restart
    their chain per chunk (documented scale-mode semantics).

    The repartition happens AFTER chunking, keyed by (source, doc_id,
    chunk_idx): ``explode`` preserves the upstream partitioning, so
    repartitioning first leaves every chunk of a long doc in ONE task and
    the whale serializes anyway — measured in BENCH/SCALE_PROBE.md part 2
    (round 5): pre-chunk salting left a 400k-token doc's 20 chunks in one
    17 s task; post-chunk hash spreading bounds the max task at one chunk's
    cost."""
    from changepoynt_spark.operators.scoring import min_required_length, score_series
    halo = min_required_length(algorithm, params)
    chunked = chunk_series(df, max_len=max_len, halo=halo)
    if num_partitions:
        chunked = chunked.repartition(
            num_partitions, F.xxhash64('source', 'doc_id', 'chunk_idx'))
    scored = score_series(chunked, algorithm=algorithm, params=params)
    return reassemble_chunked_scores(scored)


def reassemble_chunked_scores(scored: DataFrame, score_col: str = 'score') -> DataFrame:
    """Explode chunk scores to long format keeping only owned positions.
    Returns (doc_id, source, pos, score) with globally unique positions."""
    exploded = scored.select(
        'doc_id', 'source', 'chunk_lo', 'valid_from', 'valid_to',
        F.posexplode(score_col).alias('_local', score_col))
    pos = F.col('chunk_lo') + F.col('_local')
    return (exploded.withColumn('pos', pos)
                    .filter((pos >= F.col('valid_from')) & (pos < F.col('valid_to')))
                    .select('doc_id', 'source', 'pos', score_col))
