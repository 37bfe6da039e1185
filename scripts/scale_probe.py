"""Scale probe for the dedup surface beyond sf0.1 (round-4 item #5).

Generates synthetic documents corpora with planted near-duplicates at
5k / 50k / 200k docs (1x / 10x / 40x the sf0.1 corpus), runs the three
heaviest dedup operators — banded MinHash LSH (+ exact verify), inverted-
index n-gram Jaccard, and connected-component dup clustering — at every
scale, and writes BENCH/SCALE_PROBE.md with rows, candidate mass, wall
times and the scale ratios.

Linearity expectations (and what a deviation means):
- MinHash banding: candidate mass ~ planted-dup count + band collisions;
  near-linear if bucket sizes stay bounded.
- n-gram Jaccard: candidate pairs from shared shingles grow with shingle
  document frequency; the df_cap stop-shingle filter (scaled with corpus
  size here, as production would) is what keeps the join linear.
- CC clustering: rounds ~ O(log n); work per round ~ pairs.

Usage: python scripts/scale_probe.py [--scales 5000,50000,200000]
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
    from changepoynt_spark.operators import dedup
    from changepoynt_spark.sources.datagen import documents_table_distributed

    path = f'{workdir}/docs_{n_docs}'
    t0 = time.perf_counter()
    if not os.path.exists(path):
        docs_gen = documents_table_distributed(
            spark, n_docs, partitions=spark.sparkContext.defaultParallelism * 4)
        docs_gen.write.mode('overwrite').parquet(path)
    gen_wall = time.perf_counter() - t0
    docs = spark.read.parquet(path)

    out = {'n_docs': n_docs, 'gen_wall': round(gen_wall, 2)}

    # --- banded MinHash LSH: candidates (threshold 0) + verified dups -----
    t0 = time.perf_counter()
    pairs0 = dedup.minhash_lsh_pairs(docs, num_hashes=32, bands=8, threshold=0.0)
    agg = pairs0.agg(
        F.count('*').alias('cand'),
        F.sum((F.col('jaccard') >= 0.5).cast('long')).alias('dups')).first()
    out['minhash_wall'] = round(time.perf_counter() - t0, 2)
    out['minhash_candidates'] = int(agg['cand'] or 0)
    out['minhash_dups'] = int(agg['dups'] or 0)

    # --- inverted-index n-gram Jaccard --------------------------------------
    # df_cap is an ABSOLUTE boilerplate ceiling, not corpus-proportional: a
    # shingle in >200 docs is boilerplate at any corpus size, and capping df
    # bounds the per-shingle join fan-out (df^2/2) independently of n_docs —
    # the property that keeps the index join linear at 100 TB
    df_cap = 200
    t0 = time.perf_counter()
    jd = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5, df_cap=df_cap)
    out['ngram_pairs'] = jd.count()
    out['ngram_wall'] = round(time.perf_counter() - t0, 2)
    out['ngram_df_cap'] = df_cap

    # --- CC dup clustering over the verified minhash pairs ----------------
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=32, bands=8, threshold=0.5)
    t0 = time.perf_counter()
    clusters = dedup.dup_clusters(pairs)
    out['cc_clusters'] = clusters.select('cluster_id').distinct().count()
    out['cc_wall'] = round(time.perf_counter() - t0, 2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--scales', default='5000,50000,200000')
    ap.add_argument('--workdir', default='/tmp/scale_probe')
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(',')]

    from changepoynt_spark.session import get_spark
    spark = get_spark()
    os.makedirs(args.workdir, exist_ok=True)
    probe(spark, 500, args.workdir)  # discarded warmup: python workers, codegen
    results = [probe(spark, n, args.workdir) for n in scales]
    spark.stop()

    base = results[0]
    lines = [
        '# BENCH/SCALE_PROBE — dedup surface beyond sf0.1',
        '',
        f'Synthetic documents corpora (planted ~15% near-dups, quadratically '
        f'skewed vocab, deterministic per-doc recipe — sources/datagen.py '
        f'documents_table_distributed) at {", ".join(str(s) for s in scales)} docs; '
        'the sf0.1 driver corpus is 5,000 docs, so the largest point is '
        f'{scales[-1] // 5000}x that scale.  local[32], parquet-backed scans, '
        'a discarded 500-doc warmup probe first (python workers/codegen).',
        '',
        '| docs | minhash wall (s) | candidates | verified dups | ngram wall (s) '
        '| ngram pairs (df_cap) | CC wall (s) | clusters |',
        '|---|---|---|---|---|---|---|---|',
    ]
    for r in results:
        lines.append(
            f"| {r['n_docs']} | {r['minhash_wall']} | {r['minhash_candidates']} "
            f"| {r['minhash_dups']} | {r['ngram_wall']} "
            f"| {r['ngram_pairs']} ({r['ngram_df_cap']}) | {r['cc_wall']} "
            f"| {r['cc_clusters']} |")
    lines += ['', '## Scale ratios (vs first row; ideal = docs ratio)', '']
    for r in results[1:]:
        k = r['n_docs'] / base['n_docs']
        lines.append(
            f"- **{k:.0f}x docs**: minhash wall {r['minhash_wall'] / base['minhash_wall']:.1f}x, "
            f"candidates {r['minhash_candidates'] / max(base['minhash_candidates'], 1):.1f}x, "
            f"ngram wall {r['ngram_wall'] / base['ngram_wall']:.1f}x, "
            f"CC wall {r['cc_wall'] / base['cc_wall']:.1f}x")
    lines += [
        '',
        'Wall ratios below the docs ratio at small scale mean fixed per-job '
        'costs (session/stage setup, python worker spin-up) still dominate; '
        'the candidate-mass ratio is the true shuffle-volume scaling signal '
        '(bounded bucket sizes -> ~linear in planted dups).',
    ]
    bench_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'BENCH')
    os.makedirs(bench_dir, exist_ok=True)
    with open(os.path.join(bench_dir, 'SCALE_PROBE.md'), 'w') as f:
        f.write('\n'.join(lines) + '\n')
    print(json.dumps(results))


if __name__ == '__main__':
    main()
