"""Streaming heavy hitters: bounded-memory Misra-Gries candidate state.

The streaming twin of :func:`changepoynt_spark.operators.frequent.
heavy_hitters`'s FIRST pass.  The batch operator summarizes per PARTITION;
the stream summarizes per SALT GROUP (``pmod(xxhash64(item), salt_n)`` —
every occurrence of an item lands in the same group, so the pigeonhole
guarantee is per-group, not per-arbitrary-split): ``applyInPandasWithState``
folds each micro-batch's value counts into a bounded counter map with the
SAME vectorized decrement rule as the batch summarizer — state per group is
O(candidate_k) forever, regardless of stream length or vocabulary size.

What is and is not deterministic — stated, not hidden: the MG LOWER BOUNDS
depend on fold order (which micro-batch a decrement lands in), so the
bound values are not a stream==batch invariant.  The CANDIDATE-SET property
is: after any prefix of the stream, a group's state contains EVERY item
whose frequency in that prefix exceeds N_group/(candidate_k+1) — each
decrement subtracts equally from >= candidate_k+1 counters, so an item with
frequency above that bound cannot be driven to zero by ANY decrement
schedule.  The exact second pass (a batch recount restricted to the
streamed candidates, the batch operator's own step 3) therefore returns
exactly the true top-k whenever the top-k are that heavy — asserted
stream-vs-batch in tests/test_streaming.py.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_heavy_hitter_state(stream_df: DataFrame, item_col: str,
                                 candidate_k: int = 256,
                                 salt_n: int = 32) -> DataFrame:
    """Per-trigger emission of each salt group's current Misra-Gries
    candidate summary: ``(salt, item, lower, version)`` — ``version``
    increments per trigger, so the LATEST version per group is the current
    state (update-mode semantics made explicit in the rows, which keeps the
    output usable through append-only sinks too).

    Use with ``outputMode('update')``.  Feed the final candidates to the
    batch exact recount (operators.frequent.heavy_hitters step 3) for true
    top-k counts.
    """
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    item_type = stream_df.schema[item_col].dataType
    out_schema = T.StructType([
        T.StructField('salt', T.IntegerType(), False),
        T.StructField('item', item_type, True),
        T.StructField('lower', T.LongType(), False),
        T.StructField('version', T.IntegerType(), False)])
    state_schema = T.StructType([
        T.StructField('items', T.ArrayType(item_type), True),
        T.StructField('lowers', T.ArrayType(T.LongType()), True),
        T.StructField('version', T.IntegerType(), True)])

    cap = 4 * candidate_k

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            items, lowers, version = state.get
            acc = pd.Series(list(lowers), index=list(items), dtype='int64')
        else:
            acc, version = pd.Series(dtype='int64'), 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            counts = pdf['item'].value_counts()
            acc = counts.astype('int64') if acc.empty \
                else acc.add(counts, fill_value=0).astype('int64')
            if len(acc) > cap:
                # batched decrement: subtract the (candidate_k+1)-th largest
                # count from everyone, drop non-positives — every decrement
                # hits >= candidate_k+1 counters equally (the MG guarantee)
                cut = acc.nlargest(candidate_k + 1).iloc[-1]
                acc = acc[acc > cut] - cut
        version += 1
        state.update((list(acc.index), [int(v) for v in acc.to_numpy()],
                      version))
        yield pd.DataFrame({'salt': int(key[0]),
                            'item': acc.index,
                            'lower': acc.to_numpy(dtype='int64'),
                            'version': version})

    salted = stream_df.select(
        F.pmod(F.xxhash64(item_col), F.lit(salt_n)).cast('int').alias('salt'),
        F.col(item_col).alias('item'))
    return (salted.groupBy('salt')
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    outputMode='update',
                                    timeoutConf=GroupStateTimeout.NoTimeout))


def recount_candidates(df: DataFrame, item_col: str, candidates: DataFrame,
                       k: int = 20) -> DataFrame:
    """The exact second pass over a batch view of the data: count ONLY the
    streamed candidates (broadcast semi-join — the full vocabulary never
    shuffles) and take the true top-k.  Identical to the batch operator's
    recount step; output (item, cnt) ordered (cnt desc, item)."""
    items = df.select(F.col(item_col).alias('item'))
    cand = candidates.select('item').distinct()
    exact = (items.join(F.broadcast(cand), 'item')
                  .groupBy('item').agg(F.count('*').alias('cnt')))
    return exact.orderBy(F.col('cnt').desc(), F.col('item').asc()).limit(k)
