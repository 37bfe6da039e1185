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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _misra_gries(values: np.ndarray, k: int) -> dict:
    """Classic MG sketch: at most k counters; any item with frequency
    > len(values)/ (k+1) is guaranteed present."""
    counters: dict = {}
    for x in values:
        if x in counters:
            counters[x] += 1
        elif len(counters) < k:
            counters[x] = 1
        else:
            dead = [key for key in counters if counters[key] == 1]
            for key in counters:
                counters[key] -= 1
            for key in dead:
                del counters[key]
    return counters


def heavy_hitters(df: DataFrame, item_col: str, k: int = 20,
                  candidate_k: int = 256) -> DataFrame:
    """Exact global top-``k`` items by count, computed with candidate
    pruning: only ~``candidate_k`` items per partition ever reach an
    exchange.  Output: (item, cnt), ordered (cnt desc, item) — identical to
    the naive full-shuffle top-k when the true top-k are heavier than
    N/candidate_k (the MG guarantee; make candidate_k >> k)."""
    items = df.select(F.col(item_col).alias('item'))

    def summarize(batches):
        counters: dict = {}
        n = 0
        for pdf in batches:
            vals = pdf['item'].to_numpy()
            n += len(vals)
            # fold the batch through the shared MG state: exact counts
            # first (cheap, vectorized), then MG-merge into the state
            u, c = np.unique(vals, return_counts=True)
            for item, cnt in zip(u, c):
                counters[item] = counters.get(item, 0) + int(cnt)
            if len(counters) > 4 * candidate_k:
                # MG decrement step, batched: subtract the (candidate_k+1)-th
                # largest count from everyone; drop non-positives
                cut = sorted(counters.values(), reverse=True)[candidate_k]
                counters = {i: c - cut for i, c in counters.items() if c > cut}
        out = pd.DataFrame({'item': list(counters.keys()),
                            'lower': [int(v) for v in counters.values()]})
        return iter([out])

    sketch_schema = T.StructType([
        T.StructField('item', df.schema[item_col].dataType),
        T.StructField('lower', T.LongType()),
    ])
    candidates = (items.mapInPandas(summarize, schema=sketch_schema)
                       .groupBy('item').agg(F.sum('lower').alias('lower'))
                       .orderBy(F.col('lower').desc(), 'item')
                       .limit(candidate_k)
                       .select('item'))
    exact = (items.join(F.broadcast(candidates), on='item', how='inner')
                  .groupBy('item').agg(F.count('*').alias('cnt')))
    return exact.orderBy(F.col('cnt').desc(), 'item').limit(k)
