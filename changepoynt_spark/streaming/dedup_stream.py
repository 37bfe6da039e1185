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
