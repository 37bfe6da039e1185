#!/usr/bin/env python
"""Windowed-BPE learning-cost curve (r7): wall time vs merge count for the
rank-batched learner, plus the sequential (argmax-per-round) learner at the
same small vocab for contrast — the evidence that batching makes 1k+ merges
a ~K/batch-shuffle job instead of K.

    python scripts/bpe_curve.py [--sf-dir /root/testdata/sf0.1]
Appends a table to stdout; paste into BENCH/R7_NOTES.md.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--sf-dir', default=os.environ.get(
        'SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1'))
    args = ap.parse_args()
    from changepoynt_spark.session import get_spark
    from changepoynt_spark.operators import bpe
    spark = get_spark(app_name='bpe-curve', shuffle_partitions=8)
    docs = spark.read.parquet(f'{args.sf_dir}/documents.parquet').cache()
    docs.count()
    print('| learner | merges | rounds | wall (s) | s / merge |')
    print('|---|---|---|---|---|')
    for rounds in (1, 4, 9, 18):
        t0 = time.monotonic()
        merges, rep = bpe.learn_bpe_merges_windowed(
            docs, n_rounds=rounds, batch=64, window=4, mode='rank')
        rep.unpersist()
        dt = time.monotonic() - t0
        print(f'| windowed rank-batch (64/round) | {len(merges)} | {rounds} '
              f'| {dt:.1f} | {dt / max(1, len(merges)):.3f} |')
    t0 = time.monotonic()
    seq = bpe.learn_bpe_merges(docs, n_merges=64)
    dt = time.monotonic() - t0
    print(f'| classic sequential (argmax/round) | {len(seq)} | {len(seq)} '
          f'| {dt:.1f} | {dt / max(1, len(seq)):.3f} |')
    spark.stop()


if __name__ == '__main__':
    main()
