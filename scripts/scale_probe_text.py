"""Scale probe for the round-5 text-scoring operators (unigram perplexity
filter + DSIR importance weights) beyond sf0.1.

Same protocol as scripts/scale_probe.py (the dedup probe): synthetic
documents corpora at 5k / 50k / 200k docs (1x / 10x / 40x the sf0.1
corpus), identical operator parameters at every scale, wall times and scale
ratios into BENCH/SCALE_PROBE_TEXT.md.

Linearity expectations:
- unigram_logprob: one explode shuffle (corpus word instances), a vocab-
  sized reduction (vocab is CAPPED at 2000 words by the generator, so the
  logprob join side stays constant), one doc aggregate -> wall ~ tokens.
- dsir_importance: same shape with dim=64 bucket stats (constant-size
  broadcast at any corpus) -> wall ~ tokens.
Deviation from ~linear wall growth (beyond fixed per-job costs) means a
shuffle is fanning out super-linearly — the thing the probe exists to catch.

Usage: python scripts/scale_probe_text.py [--scales 5000,50000,200000]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(spark, n_docs: int, workdir: str) -> dict:
    from pyspark.sql import functions as F
    from changepoynt_spark.operators import text
    from changepoynt_spark.sources.datagen import documents_table_distributed

    path = f'{workdir}/docs_{n_docs}'
    if not os.path.exists(path):
        documents_table_distributed(
            spark, n_docs,
            partitions=spark.sparkContext.defaultParallelism * 4) \
            .write.mode('overwrite').parquet(path)
    docs = spark.read.parquet(path)
    n_tokens = docs.select(F.sum(F.size(F.split('text', ' ')))).first()[0]
    out = {'n_docs': n_docs, 'n_tokens': int(n_tokens)}

    t0 = time.perf_counter()
    ppl = text.unigram_logprob(docs)
    agg = ppl.agg(F.count('*').alias('n'),
                  F.round(F.avg('perplexity'), 2).alias('mean_ppl')).first()
    out['unigram_wall'] = round(time.perf_counter() - t0, 2)
    out['unigram_rows'] = int(agg['n'])
    out['unigram_mean_ppl'] = float(agg['mean_ppl'])

    t0 = time.perf_counter()
    w = text.dsir_importance(docs, ('src0', 'src1', 'src2'), dim=64)
    agg = w.agg(F.count('*').alias('n'),
                F.round(F.avg('weight'), 4).alias('mean_w')).first()
    out['dsir_wall'] = round(time.perf_counter() - t0, 2)
    out['dsir_rows'] = int(agg['n'])
    out['dsir_mean_weight'] = float(agg['mean_w'])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--scales', default='5000,50000,200000')
    ap.add_argument('--workdir', default='/tmp/scale_probe_docs')
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(',')]

    from changepoynt_spark.session import get_spark
    cpus = int(os.environ.get('SPARK_GRAFT_CPUS', '32'))
    spark = get_spark(app_name='scale-probe-text', master=f'local[{cpus}]',
                      shuffle_partitions=2 * cpus)
    results = [probe(spark, n, args.workdir) for n in scales]
    spark.stop()

    base = results[0]
    lines = [
        '# BENCH/SCALE_PROBE_TEXT — text-scoring operators at 1x/10x/40x',
        '',
        'Same operators, same parameters, synthetic documents corpora '
        '(planted near-dups, capped 2000-word vocab) at '
        f'{", ".join(str(s) for s in scales)} docs '
        f'(local[{os.environ.get("SPARK_GRAFT_CPUS", "32")}]).  '
        'Wall ratios vs the token ratio tell the scaling story: both '
        'operators carry constant-size reduction sides (vocab / 64 '
        'buckets), so wall should track tokens.',
        '',
        '| docs | tokens | unigram wall (s) | dsir wall (s) |'
        ' token ratio | unigram ratio | dsir ratio |',
        '|---|---|---|---|---|---|---|',
    ]
    for r in results:
        tr = r['n_tokens'] / base['n_tokens']
        ur = r['unigram_wall'] / base['unigram_wall']
        dr = r['dsir_wall'] / base['dsir_wall']
        lines.append(
            f"| {r['n_docs']} | {r['n_tokens']} | {r['unigram_wall']} "
            f"| {r['dsir_wall']} | {tr:.1f}x | {ur:.1f}x | {dr:.1f}x |")
    lines += ['', '```json', json.dumps(results), '```', '']
    os.makedirs('BENCH', exist_ok=True)
    with open('BENCH/SCALE_PROBE_TEXT.md', 'w') as f:
        f.write('\n'.join(lines))
    print(json.dumps(results))


if __name__ == '__main__':
    main()
