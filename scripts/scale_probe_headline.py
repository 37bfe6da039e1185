"""Scale probe for the HEADLINE scoring pipeline (round-5 item #2).

Round 4 probed the dedup surface; this probes the north-rule path itself:
tokens -> SST(ika) scores -> tier rollup -> compressed blocks, under a
heavy-tailed length distribution, at 1x / 10x / 40x corpus scale.

Corpus recipe (deterministic, executor-side — sources/datagen.py
tokens_table_distributed): 80% short docs (700-2000 tokens), 15% medium
(2k-20k), 5% long (20k-150k), PLUS two planted 400k-token "whale" docs at
every scale.  Median doc is ~1.3k tokens, so the max doc is ~300x the
median — the skew regime the reference's linear cost model
(/root/reference/changepoynt/algorithms/base_algorithm.py:52-114) says will
serialize a naive per-doc partitioning.

Two scoring plans are compared:

- ``defused``: salted_repartition (cost-weighted salt) + chunk_series
  (20k-token chunks with a min_required_length halo) -> shuffle-free
  scoring -> reassembled scores (plans/partitioning.py:31,44 —
  score_series_chunked).  This is the production scale path.
- ``naive``: plain hash repartition, one task scores a whole doc.  Run at
  the smallest and largest scale only (it exists to show the failure mode,
  not to burn the probe budget).

Per run we record wall AND the max-task / median-task duration of the
heaviest stage (Spark UI REST taskSummary) — the direct measurement of
whether the whale serializes a task.  The fused rollup+compression pipeline
(operators/fused.py score_rollup) is also run at every scale on the same
corpora.

Usage: python scripts/scale_probe_headline.py [--scales 400,4000,16000]
Appends a section to BENCH/SCALE_PROBE.md.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SST_PARAMS = {'window_length': 30, 'n_windows': 30, 'lag': 10, 'rank': 2,
              'method': 'ika', 'scoring_step': 2}
CHUNK_LEN = 20_000
WHALE_LEN = 400_000
N_WHALES = 2


def _whales(spark, n_whales: int, length: int):
    """Planted pathological docs, same random-walk recipe as the corpus."""
    import numpy as np
    import pandas as pd
    from changepoynt_spark.sources.datagen import TOKENS_SCHEMA, _random_walk_tokens

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf['id'].to_numpy():
                rng = np.random.default_rng(7_000_000 + int(i))
                rows.append((f'whale_{int(i):04d}', _random_walk_tokens(rng, length),
                             length, f'src{int(i) % 8}'))
            yield pd.DataFrame(rows, columns=['doc_id', 'tokens', 'n_tok', 'source'])

    return spark.range(0, n_whales, numPartitions=n_whales).mapInPandas(
        gen, schema=TOKENS_SCHEMA)


def build_corpus(spark, n_docs: int, workdir: str) -> str:
    from changepoynt_spark.sources.datagen import tokens_table_distributed
    path = f'{workdir}/tokens_{n_docs}'
    if not os.path.exists(path):
        bulk = tokens_table_distributed(
            spark, n_docs, max_len=150_000,
            partitions=spark.sparkContext.defaultParallelism * 4)
        bulk.unionByName(_whales(spark, N_WHALES, WHALE_LEN)) \
            .write.mode('overwrite').parquet(path)
    return path


def _completed_stage_ids(spark) -> set:
    url = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f'{url}/api/v1/applications'))
    app_id = apps[0]['id']
    stages = json.load(urllib.request.urlopen(
        f'{url}/api/v1/applications/{app_id}/stages?status=COMPLETE'))
    return {s['stageId'] for s in stages}


def _task_skew(spark, before_ids: set) -> dict:
    """(median, max) task duration of the heaviest NEW completed stage."""
    url = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f'{url}/api/v1/applications'))
    app_id = apps[0]['id']
    stages = json.load(urllib.request.urlopen(
        f'{url}/api/v1/applications/{app_id}/stages?status=COMPLETE'))
    new = [s for s in stages if s['stageId'] not in before_ids]
    if not new:
        return {}
    heavy = max(new, key=lambda s: s.get('executorRunTime', 0))
    ts = json.load(urllib.request.urlopen(
        f"{url}/api/v1/applications/{app_id}/stages/{heavy['stageId']}"
        f"/{heavy['attemptId']}/taskSummary?quantiles=0.0,0.5,1.0"))
    dur = ts['duration']  # [min, median, max] ms
    return {'stage': heavy['stageId'], 'n_tasks': heavy['numCompleteTasks'],
            'task_med_s': round(dur[1] / 1000, 2),
            'task_max_s': round(dur[2] / 1000, 2),
            'skew': round(dur[2] / max(dur[1], 1.0), 1)}


def probe(spark, n_docs: int, workdir: str, run_naive: bool) -> dict:
    from pyspark.sql import functions as F
    from changepoynt_spark.operators.fused import score_rollup
    from changepoynt_spark.plans.partitioning import score_series_chunked
    from changepoynt_spark.operators.scoring import score_series

    path = build_corpus(spark, n_docs, workdir)
    tokens = spark.read.parquet(path)
    total_tok = tokens.agg(F.sum('n_tok')).first()[0]
    parts = spark.sparkContext.defaultParallelism * 6
    out = {'n_docs': n_docs + N_WHALES, 'total_tokens': int(total_tok)}

    # --- defused: salted repartition + chunk-with-halo --------------------
    before = _completed_stage_ids(spark)
    t0 = time.perf_counter()
    scored = score_series_chunked(tokens, 'sst', params=SST_PARAMS,
                                  max_len=CHUNK_LEN, num_partitions=parts)
    out['defused_scores'] = scored.count()
    out['defused_wall'] = round(time.perf_counter() - t0, 2)
    out['defused_skew'] = _task_skew(spark, before)

    # --- naive: whole-doc tasks, plain hash partitioning ------------------
    # (same long-format output as the defused path, so walls compare
    # apples-to-apples: both pay the posexplode)
    if run_naive:
        before = _completed_stage_ids(spark)
        t0 = time.perf_counter()
        naive = score_series(
            tokens.repartition(parts, F.xxhash64('doc_id')),
            algorithm='sst', params=SST_PARAMS)
        long = naive.select('doc_id', 'source',
                            F.posexplode('score').alias('pos', 'score'))
        out['naive_scores'] = long.count()
        out['naive_wall'] = round(time.perf_counter() - t0, 2)
        out['naive_skew'] = _task_skew(spark, before)

    # --- fused rollup + compression on the same corpus --------------------
    # (fused path chunks internally? no — it scores whole docs per row, so
    # feed it the salted+chunked frame semantics are different; the fused
    # bench corpus is the bench.py recipe.  Here we run it on the bulk docs
    # EXCLUDING whales (chunk ownership of tier buckets spans chunks), which
    # still carries the 150k-token 5% tail = 100x the median.)
    bulk = tokens.filter(~F.col('doc_id').startswith('whale_'))
    before = _completed_stage_ids(spark)
    t0 = time.perf_counter()
    blocks = score_rollup(bulk.repartition(parts, F.xxhash64('source', 'doc_id')),
                          algorithm='sst', params=SST_PARAMS, output='blocks')
    stats = blocks.agg(F.sum('n_points').alias('p'),
                       F.sum(F.length('ts_blob') + F.length('value_blob')).alias('b')
                       ).first()
    out['fused_wall'] = round(time.perf_counter() - t0, 2)
    out['fused_rolled_points'] = int(stats['p'] or 0)
    out['fused_skew'] = _task_skew(spark, before)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--scales', default='400,4000,16000')
    ap.add_argument('--workdir', default='/tmp/scale_probe_headline')
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(',')]

    from changepoynt_spark.session import get_spark
    spark = get_spark(app_name='scale-probe-headline',
                      extra_conf={'spark.ui.enabled': 'true'})
    os.makedirs(args.workdir, exist_ok=True)

    # warmup: python workers + codegen, discarded
    from changepoynt_spark.sources.datagen import tokens_table
    from changepoynt_spark.operators.scoring import score_series
    score_series(tokens_table(spark, n_docs=32, include_golden=False),
                 algorithm='sst', params=SST_PARAMS).count()

    results = []
    for i, n in enumerate(scales):
        run_naive = (i == 0 or i == len(scales) - 1)
        r = probe(spark, n, args.workdir, run_naive)
        print(json.dumps(r))
        results.append(r)
    spark.stop()

    base = results[0]
    lines = [
        '', '---', '',
        '# BENCH/SCALE_PROBE part 2 — headline scoring pipeline '
        '(heavy-tail skew, round 5)',
        '',
        f'Corpora: {", ".join(str(s) for s in scales)} bulk docs '
        '(80% 700-2k tokens / 15% 2k-20k / 5% 20k-150k, executor-side '
        'deterministic recipe) **plus two planted 400k-token whale docs at '
        'every scale** — median ~1.3k tokens, max 400k = ~300x the median. '
        'SST(ika) w=30, n_windows=30, lag=10, rank=2, step=2; local[32].',
        '',
        '- **defused** = salted_repartition + chunk_series(20k, halo) + '
        'shuffle-free scoring + owned-position reassembly '
        '(plans/partitioning.py score_series_chunked — the production path).',
        '- **naive** = plain hash repartition, one task per whole doc '
        '(the failure mode; run at first/last scale only).',
        '- **fused** = score->rollup->Gorilla blocks one-pass '
        '(operators/fused.py) on the bulk corpus (max 150k = ~100x median).',
        '- task med/max = per-task duration quantiles of the heaviest stage '
        '(Spark UI REST taskSummary); skew = max/median.',
        '',
        '| docs | tokens | defused wall (s) | defused task med/max (skew) | '
        'naive wall (s) | naive task med/max (skew) | fused wall (s) | '
        'fused task med/max (skew) |',
        '|---|---|---|---|---|---|---|---|',
    ]

    def fmt_skew(d):
        if not d:
            return '-'
        return f"{d['task_med_s']}/{d['task_max_s']} ({d['skew']}x)"

    for r in results:
        naive_w = r.get('naive_wall', '-')
        lines.append(
            f"| {r['n_docs']} | {r['total_tokens']:,} | {r['defused_wall']} "
            f"| {fmt_skew(r['defused_skew'])} | {naive_w} "
            f"| {fmt_skew(r.get('naive_skew', {}))} | {r['fused_wall']} "
            f"| {fmt_skew(r['fused_skew'])} |")

    lines += ['', '## Scale ratios (vs first row; ideal = token ratio)', '']
    for r in results[1:]:
        k = r['total_tokens'] / base['total_tokens']
        lines.append(
            f"- **{k:.1f}x tokens**: defused wall "
            f"{r['defused_wall'] / base['defused_wall']:.1f}x, fused wall "
            f"{r['fused_wall'] / base['fused_wall']:.1f}x")
    lines.append('')
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), 'BENCH', 'SCALE_PROBE.md'), 'a') as f:
        f.write('\n'.join(lines))
    print('appended BENCH/SCALE_PROBE.md')


if __name__ == '__main__':
    main()
