"""Heavy hitters (frequent items) with bounded shuffle.

The naive top-k (`groupBy(item).count().orderBy(...)`) shuffles EVERY
distinct item — at 100 TB of text that is the full vocabulary + noise (URLs,
ids, typos), easily billions of rows of exchange.  The classic two-pass
bound (Misra-Gries summaries + exact recount) shuffles only candidates:

1. per-partition Misra-Gries(k') summaries (Arrow-batched; O(k') memory per
   partition regardless of distinct count),
2. merge candidate sets — pigeonhole guarantees any item with global
   frequency > N/k' survives in at least one partition summary, so the
   candidate set is a SUPERSET of every (N/k')-heavy item,
3. one exact recount restricted to the (tiny, broadcast) candidate set —
   final counts are EXACT, so the result is identical to the naive top-k
   whenever the true top-k are (N/k')-heavy (pick k' >> k; asserted in
   tests and by the DuckDB oracle, which IS the naive top-k).
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def heavy_hitters(df: DataFrame, item_col: str, k: int = 20,
                  candidate_k: int = 256) -> DataFrame:
    """Exact global top-``k`` items by count, computed with candidate
    pruning: only O(``candidate_k``) items per partition ever reach an
    exchange.  Output: (item, cnt), ordered (cnt desc, item) — identical to
    the naive full-shuffle top-k when the true top-k are heavier than
    N/candidate_k (the MG guarantee; make candidate_k >> k).

    The merge stage keeps EVERY candidate that survives any partition
    summary (<= 4*candidate_k per partition), preserving the superset
    guarantee strictly — a top-candidate_k cut of summed lower bounds
    could in theory evict a true heavy item ranked low by its bounds."""
    items = df.select(F.col(item_col).alias('item'))

    def summarize(batches):
        # fully vectorized Misra-Gries-style fold: value_counts add per
        # Arrow batch (no per-unique-item Python loop), batched decrement
        # when the state exceeds 4*candidate_k — subtract the
        # (candidate_k+1)-th largest count from everyone, drop
        # non-positives.  Each decrement lowers >= candidate_k+1 counters
        # equally, so any item with partition frequency > N_p/(candidate_k+1)
        # survives with a positive lower bound (the classic MG guarantee).
        acc = pd.Series(dtype='int64')
        for pdf in batches:
            counts = pdf['item'].value_counts()
            acc = counts.copy() if acc.empty else acc.add(counts, fill_value=0)
            if len(acc) > 4 * candidate_k:
                cut = acc.nlargest(candidate_k + 1).iloc[-1]
                acc = acc[acc > cut] - cut
        out = pd.DataFrame({'item': acc.index,
                            'lower': acc.to_numpy(dtype='int64')})
        return iter([out])

    sketch_schema = T.StructType([
        T.StructField('item', df.schema[item_col].dataType),
        T.StructField('lower', T.LongType()),
    ])
    candidates = (items.mapInPandas(summarize, schema=sketch_schema)
                       .select('item').distinct())
    exact = (items.join(F.broadcast(candidates), on='item', how='inner')
                  .groupBy('item').agg(F.count('*').alias('cnt')))
    return exact.orderBy(F.col('cnt').desc(), 'item').limit(k)
