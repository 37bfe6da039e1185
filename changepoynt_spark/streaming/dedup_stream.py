"""Streaming exact deduplication over a document stream.

The batch engine dedups with a hash-groupBy (operators/dedup.py); on a
stream the same contract — at most one surviving row per distinct text —
needs bounded state.  Structured Streaming's
``dropDuplicatesWithinWatermark`` keeps one state entry per distinct hash
and expires it once the watermark passes, so state is bounded by the late-
data horizon instead of the corpus size: exactly the semantics a training-
data ingest wants (suppress re-crawls/replays arriving within the horizon;
a true re-appearance much later is a new observation).

Keys on md5(text) — the same identity the batch exact_dup_groups uses — so
the stream and batch agree on what a duplicate is.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(stream_df: DataFrame, ts_col: str = 'ts',
                          text_col: str = 'text',
                          delay: str = '10 minutes') -> DataFrame:
    """(…, ts, text) stream -> first-seen rows only, per distinct text.

    ``delay`` is the watermark horizon: duplicates arriving within it are
    suppressed; state for a hash is dropped once the watermark passes its
    first-seen event time (bounded state at 10^12-doc scale).
    """
    hashed = stream_df.withColumn('text_hash', F.md5(text_col)) \
                      .withColumn(ts_col, F.col(ts_col).cast('timestamp'))
    return (hashed.withWatermark(ts_col, delay)
                  .dropDuplicatesWithinWatermark(['text_hash']))


def streaming_lsh_candidates(stream_df, ts_col: str = 'ts',
                             num_hashes: int = 32, bands: int = 8, n: int = 3,
                             id_col: str = 'doc_id',
                             watermark_delay: str = '10 minutes',
                             max_pair_gap: str = None):
    """Streaming near-duplicate CANDIDATE pairs: as documents arrive, each
    is banded (MinHash LSH, same signatures as the batch path) and
    stream-stream self-joined on (band, band hash) within the watermark —
    a new doc surfaces a candidate pair with every recent doc sharing a
    band.  Downstream verifies candidates exactly (batch jaccard, or
    foreachBatch) — identical recall contract to the batch LSH: a pair is
    emitted iff some band collides.

    State is bounded by the watermark: band-hash state older than the
    delay is dropped.  Self-join dedup: pairs ordered (a < b) and
    dropDuplicates on (a, b) within the watermark, so a multi-band
    collision emits once."""
    from changepoynt_spark.operators.dedup import minhash_signatures
    from pyspark.sql import functions as F
    rows_per_band = num_hashes // bands

    def banded(df, side):
        sigs = minhash_signatures(df, num_hashes=num_hashes, n=n, id_col=id_col)
        sigs = df.select(id_col, ts_col).join(sigs, id_col)
        b = sigs.select(
            F.col(id_col).alias(f'{side}_id'),
            F.col(ts_col).cast('timestamp').alias(f'{side}_ts'),
            F.posexplode(F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.xxhash64(F.concat_ws(
                    ',', F.slice('signature', i * rows_per_band + 1,
                                 rows_per_band))))).alias(f'{side}_band',
                                                          f'{side}_bh'))
        return b.withWatermark(f'{side}_ts', watermark_delay)

    left = banded(stream_df, 'l')
    right = banded(stream_df, 'r')
    # SYMMETRIC time bound: id order (l_id < r_id) is independent of
    # arrival order, so the matching doc may sit on either side in time.
    # The bound tracks the WATERMARK DELAY by default (a pair is emitted
    # iff some band collides within the watermark horizon — state for
    # older rows is dropped anyway, so a wider bound would silently miss
    # pairs); pass max_pair_gap to narrow it deliberately.
    gap = max_pair_gap or watermark_delay
    cond = F.expr(
        f'l_band = r_band AND l_bh = r_bh AND l_id < r_id '
        f'AND r_ts BETWEEN l_ts - INTERVAL {gap} '
        f'AND l_ts + INTERVAL {gap}')
    pairs = (left.join(right, cond)
                 .select(F.col('l_id').alias('doc_a'),
                         F.col('r_id').alias('doc_b'),
                         F.col('r_ts').alias('pair_ts')))
    # the joined stream inherits its event-time watermark from r_ts;
    # re-declaring one here would be a disallowed watermark redefinition
    return pairs.dropDuplicatesWithinWatermark(['doc_a', 'doc_b'])
