#!/usr/bin/env python
"""Bloom point-lookup probe: manifest blooms must turn a needle-in-N-files
equality lookup into a handful of file reads.

Writes the sf events table as ONE unclustered snapshot of --files parquet
files with per-file blooms on event_id (every file's min/max spans ~the full
id domain, so footer stats cannot prune a point probe), then times

  * plan_files + scan for --probes point lookups (bloom-pruned), and
  * the same lookups as a full-read + filter,

and reports files-kept stats.  Writes BENCH/BLOOM.md.

    python scripts/bloom_probe.py [--sf-dir .../sf0.1] [--files 64] [--probes 20]
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--sf-dir', default=os.environ.get('SPARK_GRAFT_SF_DIR',
                                                      '/root/testdata/sf0.1'))
    p.add_argument('--files', type=int, default=64)
    p.add_argument('--probes', type=int, default=20)
    p.add_argument('--out', default='BENCH/BLOOM.md')
    args = p.parse_args()

    from pyspark.sql import functions as F

    from changepoynt_spark.session import get_spark
    from changepoynt_spark.sources.tables import IcebergishTable

    spark = get_spark()
    ev = spark.read.parquet(f'{args.sf_dir}/events.parquet').select(
        'event_id', 'ts', 'user_id', 'event_type', 'value')
    ev = ev.cache()
    n_rows = ev.count()

    root = os.path.join(tempfile.mkdtemp(prefix='bloomprobe-'), 'ev')
    # warm-up: a throwaway table exercises BOTH write paths (JVM writer and
    # the mapInPandas fold-in writer) so JVM/worker cold-start is not
    # attributed to whichever path happens to run first
    warm = IcebergishTable(root + '_warm')
    warm.append(ev.limit(2000), partition_by=(), n_files=4,
                bloom_cols=['event_id'])
    warm.append(ev.limit(2000), partition_by=(), n_files=4)
    warm.read(spark).count()

    # best-of-2 appends (fresh table each time, keep the second table):
    # first-run JVM/worker variance is 1.5-1.7x on this shared VM
    write_wall = None
    for i in range(2):
        t = IcebergishTable(f'{root}_b{i}')
        t0 = time.perf_counter()
        t.append(ev, partition_by=(), n_files=args.files,
                 bloom_cols=['event_id'])
        dt = time.perf_counter() - t0
        write_wall = dt if write_wall is None or dt < write_wall else write_wall
    write_plain_wall = None
    for i in range(2):
        t_plain = IcebergishTable(f'{root}_p{i}')
        t0 = time.perf_counter()
        t_plain.append(ev, partition_by=(), n_files=args.files)
        dt = time.perf_counter() - t0
        write_plain_wall = dt if write_plain_wall is None \
            or dt < write_plain_wall else write_plain_wall
    # decomposition: the SAME fold-in writer with no bloom columns — the
    # bloom cost proper vs the python-writer-vs-JVM-writer floor
    from changepoynt_spark.sources.tables import _write_with_blooms
    import shutil as _sh
    write_nobloom_wall = None
    for i in range(2):
        d = f'{root}_nb{i}'
        t0 = time.perf_counter()
        _write_with_blooms(ev.repartition(args.files), d, [])
        dt = time.perf_counter() - t0
        _sh.rmtree(d, ignore_errors=True)
        write_nobloom_wall = dt if write_nobloom_wall is None \
            or dt < write_nobloom_wall else write_nobloom_wall

    max_id = int(ev.agg(F.max('event_id')).first()[0])
    step = max(1, max_id // (args.probes + 1))
    probe_ids = [(i + 1) * step for i in range(args.probes)]  # mid-domain ids

    # per-id file pruning (the scale proxy: files touched per needle)
    kept = [t.plan_files([('event_id', '=', eid)])['n_kept']
            for eid in probe_ids]
    plain_kept = t_plain.plan_files([('event_id', '=', probe_ids[0])])['n_kept']

    # one batched IN-scan for the whole needle set vs one full read+filter
    preds = [('event_id', 'in', probe_ids)]
    plan_in = t.plan_files(preds)
    in_kept = plan_in['n_kept']
    entries = t.snapshot(0)['manifest']['entries']
    total_bytes = sum(e['bytes'] for e in entries)
    kept_paths = {os.path.basename(pth) for ps in plan_in['kept'].values()
                  for pth in ps}
    kept_bytes = sum(e['bytes'] for e in entries
                     if os.path.basename(e['path']) in kept_paths)
    def best_of(fn, n=2):
        best, val = None, None
        for _ in range(n):
            t0 = time.perf_counter()
            val = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        return best, val
    bloom_wall, n_hit = best_of(lambda: t.scan(spark, preds).count())
    full_wall, n_hit_full = best_of(
        lambda: t_plain.read(spark)
                .filter(F.col('event_id').isin(probe_ids)).count())
    assert n_hit == n_hit_full == args.probes, (n_hit, n_hit_full)

    lines = [
        '# Bloom point-lookup probe',
        '',
        f'Input: `{args.sf_dir}/events.parquet` ({n_rows:,} rows) written as '
        f'ONE unclustered snapshot of {args.files} files; per-file manifest '
        f'blooms on `event_id` (~16 bits/row); {args.probes} point lookups, '
        'ids evenly spaced over the domain; generated by '
        '`python scripts/bloom_probe.py`.',
        '',
        '| path | files read | bytes read | wall (s), one query |',
        '|---|---|---|---|',
        f'| bloom-pruned IN-scan ({args.probes} needles) | {in_kept} of '
        f'{args.files} | {kept_bytes:,} | {bloom_wall:.2f} |',
        f'| full read + IN filter | {args.files} of {args.files} | '
        f'{total_bytes:,} | {full_wall:.2f} |',
        '',
        '(write and scan walls are best-of-2 on a warmed session)',
        '',
        f'- single-needle pruning: mean {sum(kept)/len(kept):.2f} / max '
        f'{max(kept)} of {args.files} files kept per id (bloom); the plain '
        f'table keeps {plain_kept} of {args.files} for the same mid-domain '
        'id — min/max stats cannot prune an unclustered point probe.',
        f'- bloom write overhead on this snapshot: {write_wall:.2f} s vs '
        f'{write_plain_wall:.2f} s without blooms '
        f'({write_wall / write_plain_wall:.2f}x end to end).  Blooms are '
        'built IN the write task from the same in-memory batch that '
        'writes the file (_write_with_blooms, mapInArrow): the write is '
        'the only scan — no post-pass re-read of the data, which at '
        '10^12-sequence scale would double write-path I/O.  '
        f'Decomposition: the same fold-in writer with NO blooms takes '
        f'{write_nobloom_wall:.2f} s — hashing the blooms costs '
        f'{max(0.0, (write_wall - write_plain_wall) - max(0.0, write_nobloom_wall - write_plain_wall)):.2f} s; '
        'the rest is the python-arrow writer vs JVM writer floor on '
        f'{args.files} toy-sized tasks (~200 rows/file; amortized away at '
        'real 128 MB files where parquet encoding dominates).',
        f'- at this TOY scale ({n_rows:,} rows) wall is driver-overhead '
        'dominated (per-file listing of the pruned read vs one directory '
        f'read), so walls are reported but not the headline: the scale '
        f'quantity is bytes/files read — {total_bytes / max(kept_bytes, 1):.1f}x '
        'less data touched here, and the ratio grows linearly with table '
        'size at fixed needle count: at 10^6 files of a 100 TB table the '
        'pruned probe still reads ~#needles files + false positives '
        '(<3% per file at 16 bits/row, k=5) while the stats-only path '
        'reads all 100 TB.',
        f'- every needle found exactly its row ({args.probes}/{args.probes} '
        'hits; scan == full-read+filter was asserted).',
    ]
    with open(args.out, 'w') as f:
        f.write('\n'.join(lines) + '\n')
    print('\n'.join(lines))
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
