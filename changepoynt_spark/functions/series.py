"""Turn event streams into input-hint series rows, natively.

(doc_id, tokens array<int32>, n_tok, source) from (key, ts, value) streams:
sort_array(collect_list(struct(ts, value))) guarantees a deterministic
time-ordered series per key regardless of task order; values are quantized
to int32 (x QUANT) so the result is exactly the engine's input shape.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SERIES_QUANT = 10  # events values are O(100); x10 keeps int32 range comfy


def events_to_series(df: DataFrame, key_col: str = 'user_id', ts_col: str = 'ts',
                     value_col: str = 'value', source: str = 'events',
                     partitions: int = None) -> DataFrame:
    """``partitions``: explicit hash-partition count for the groupBy shuffle.
    AQE coalesces small-byte shuffles down to one partition, which serializes
    the (CPU-bound) scoring kernels that consume these series; an explicit
    ``repartition(n, key)`` is honored by AQE and is absorbed by the groupBy
    (same clustering — still exactly one shuffle).  Leave None at scale,
    where shuffle partitions are byte-sized correctly anyway."""
    if partitions:
        df = df.repartition(partitions, key_col)
    pts = F.sort_array(F.collect_list(F.struct(ts_col, value_col)))
    tokens = F.transform(pts, lambda p: F.round(p[value_col] * SERIES_QUANT).cast('int'))
    return (df.groupBy(key_col)
              .agg(tokens.alias('tokens'))
              .select(F.col(key_col).cast('string').alias('doc_id'),
                      'tokens',
                      F.size('tokens').cast('int').alias('n_tok'),
                      F.lit(source).alias('source')))
