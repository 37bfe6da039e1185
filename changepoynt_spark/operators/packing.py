"""Training-batch assembly operators: sequence packing and hash splits.

Sequence packing — concatenating short documents into fixed-budget training
sequences — is the canonical last step of an LLM data pipeline (wasted pad
tokens = wasted FLOPs).  Optimal bin packing is NP-hard and inherently
sequential, so the scale design is: pack GREEDILY WITHIN EACH PARTITION
(best-fit-decreasing over the partition's docs, bisect bookkeeping),
which needs no shuffle at all — at 10^12 docs each partition packs its own
slice and pack quality converges to BFD's 11/9-OPT bound as partitions grow.
Pack ids are (partition, seq) pairs, globally unique without coordination.

Hash splits assign train/validation deterministically from a content-stable
hash of the doc id — reproducible across engines, runs and cluster sizes
(md5-based, so the DuckDB oracle computes the identical assignment).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PACK_SCHEMA = T.StructType([
    T.StructField('pack_id', T.StringType(), False),
    T.StructField('doc_ids', T.ArrayType(T.StringType()), False),
    T.StructField('n_docs', T.IntegerType(), False),
    T.StructField('total_tok', T.LongType(), False),
    T.StructField('fill_ratio', T.DoubleType(), False),
    T.StructField('oversize', T.BooleanType(), False),
])


def pack_sequences(df: DataFrame, budget: int = 2048, id_col: str = 'doc_id',
                   len_col: str = 'n_tok') -> DataFrame:
    """(pack_id, doc_ids, n_docs, total_tok, fill_ratio, oversize).

    Best-fit-decreasing within each partition: docs sorted by length
    descending, each placed into the open pack with the LEAST remaining
    room that still fits (bisect over a sorted remaining-capacity list —
    O(n log n) per partition, vs first-fit's O(n * packs) scan, which is
    quadratic-ish on a million-doc partition).  BFD shares FFD's 11/9-OPT
    bound.  Docs longer than ``budget`` become single-doc packs flagged
    ``oversize`` (the caller chunks or truncates those downstream).  Every
    input doc lands in exactly one pack (asserted in tests); only
    (id, length) pairs are held in memory, never token payloads.
    """

    def kernel(batches):
        import bisect
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        ids, lens = [], []
        for pdf in batches:
            ids.extend(pdf[id_col].astype(str).tolist())
            lens.extend(pdf[len_col].astype('int64').tolist())
        if not ids:
            return
        order = np.argsort(-np.asarray(lens), kind='stable')  # decreasing
        pack_docs, pack_used = [], []
        open_packs = []  # sorted list of (remaining, pack_index)
        for i in order:
            n = int(lens[i])
            if n <= budget:
                # smallest remaining >= n (best fit)
                j = bisect.bisect_left(open_packs, (n, -1))
                if j < len(open_packs):
                    rem, idx = open_packs.pop(j)
                    pack_used[idx] += n
                    pack_docs[idx].append(ids[i])
                    if rem - n > 0:
                        bisect.insort(open_packs, (rem - n, idx))
                    continue
            pack_docs.append([ids[i]])
            pack_used.append(n)
            if n < budget:
                bisect.insort(open_packs, (budget - n, len(pack_docs) - 1))
        yield pd.DataFrame({
            'pack_id': [f'{pid}-{j}' for j in range(len(pack_docs))],
            'doc_ids': pack_docs,
            'n_docs': np.array([len(d) for d in pack_docs], dtype=np.int32),
            'total_tok': np.array(pack_used, dtype=np.int64),
            'fill_ratio': np.array(pack_used, dtype=np.float64) / budget,
            'oversize': np.array([u > budget for u in pack_used], dtype=bool),
        })

    return df.select(id_col, len_col).mapInPandas(kernel, schema=PACK_SCHEMA)


def split_by_hash(df: DataFrame, val_pct: int = 10, id_col: str = 'doc_id') -> DataFrame:
    """Adds ``split``: 'val' for docs whose md5(doc_id) bucket (mod 100)
    falls below ``val_pct``, else 'train'.  Deterministic, engine-portable
    (md5 agrees everywhere), stable under repartitioning and growth — the
    properties a training/validation split must have at corpus scale."""
    bucket = F.pmod(F.conv(F.substring(F.md5(F.col(id_col).cast('string')), 1, 8),
                           16, 10).cast('long'), F.lit(100))
    return df.withColumn('split',
                         F.when(bucket < val_pct, F.lit('val')).otherwise(F.lit('train')))


def mixture_sample(df: DataFrame, rates: dict, default_rate: float = 1.0,
                   id_col: str = 'doc_id', source_col: str = 'source') -> DataFrame:
    """Deterministic per-source downsampling to target mixture weights —
    the domain-mixture step of a training-data pipeline (e.g. keep 100% of
    wiki, 30% of web).

    Keep decision: md5(doc_id || ':mix') bucket (mod 10^6) < rate * 10^6.
    Same discipline as split_by_hash — engine-portable, stable under
    repartitioning and corpus growth (a doc's fate never changes when more
    data arrives), and salted differently from the train/val split so the
    two decisions are independent.  Map-only filter: no shuffle at any
    scale."""
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.col(id_col).cast('string'),
                                          F.lit(':mix'))), 1, 8), 16, 10).cast('long'),
        F.lit(1_000_000))
    rate_col = None
    for src, rate in sorted(rates.items()):
        thr = F.lit(int(round(rate * 1_000_000)))
        rate_col = F.when(F.col(source_col) == src, thr) if rate_col is None \
            else rate_col.when(F.col(source_col) == src, thr)
    rate_col = (rate_col.otherwise(F.lit(int(round(default_rate * 1_000_000))))
                if rate_col is not None
                else F.lit(int(round(default_rate * 1_000_000))))
    return df.filter(bucket < rate_col)


def mixture_epochs(df: DataFrame, rates: dict, default_rate: float = 1.0,
                   id_col: str = 'doc_id', source_col: str = 'source') -> DataFrame:
    """Deterministic per-source UP/DOWN-sampling with epoch repetition —
    the full mixture-weighting step (e.g. wiki x2.3, web x0.3): every doc
    is emitted floor(rate) times, plus once more for the hash-selected
    ``rate - floor(rate)`` fraction.  Adds ``epoch`` (1-based copy index)
    and ``n_copies``.

    Same md5 ':mix' hash discipline as mixture_sample (a doc's fate never
    changes as the corpus grows; independent of the train/val split salt);
    map-only + a bounded explode — no shuffle at any scale."""
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.col(id_col).cast('string'),
                                          F.lit(':mix'))), 1, 8), 16, 10).cast('long'),
        F.lit(1_000_000))

    def chain(value_of):
        col = None
        for src, rate in sorted(rates.items()):
            v = F.lit(value_of(rate))
            col = F.when(F.col(source_col) == src, v) if col is None \
                else col.when(F.col(source_col) == src, v)
        dv = F.lit(value_of(default_rate))
        return col.otherwise(dv) if col is not None else dv

    n_full = chain(lambda r: int(r))
    frac_thr = chain(lambda r: int(round((r - int(r)) * 1_000_000)))
    n_copies = (n_full + (bucket < frac_thr).cast('int')).alias('n_copies')
    out = df.withColumn('n_copies', n_copies).filter(F.col('n_copies') > 0)
    return (out.withColumn('epoch', F.explode(F.sequence(F.lit(1), F.col('n_copies'))))
               .select(id_col, source_col, 'epoch', 'n_copies'))


def stratified_sample_exact(df: DataFrame, strata_cols, n_per_stratum: int,
                            id_col: str = 'doc_id') -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer iff the stratum is
    smaller), chosen deterministically: rows are ranked inside each stratum
    by md5(id || ':strat') — a uniform, engine-portable permutation — and
    the top n survive.  Unlike rate-based mixture_sample, the output SIZE
    is exact (eval sets, per-domain caps, balanced probes need counts, not
    rates); unlike a naive ORDER BY rand() LIMIT, it is reproducible and
    partitioning-independent.

    One hash-shuffle on the strata (the rank window); no global sort.  Ties
    are impossible (distinct ids -> distinct digests, and the id itself is
    the final tiebreak).
    """
    from pyspark.sql import Window
    strata_cols = list(strata_cols)
    rank_key = F.md5(F.concat(F.col(id_col).cast('string'), F.lit(':strat')))
    w = Window.partitionBy(*strata_cols).orderBy(rank_key.asc(),
                                                 F.col(id_col).asc())
    return (df.withColumn('_rn', F.row_number().over(w))
              .filter(F.col('_rn') <= n_per_stratum)
              .drop('_rn'))
