"""Per-kernel single-core throughput bench (machine-diffable regression gate).

The headline bench showed the fused pipeline is >=99% SST-kernel CPU, so
kernel throughput IS engine throughput — but until round 5 the per-kernel
numbers lived only in commit messages.  This script times every scoring
kernel on a fixed deterministic series, single-threaded (BLAS pinned, no
Spark), and writes:

- ``BENCH/KERNELS.md`` — human-readable table, and
- a ``kernels`` block merged into ``BENCH_SELF.json`` — so a kernel
  regression diffs exactly like a query-wall regression.

Throughput is points/sec-per-core: multiply by executor cores for cluster
projections (the Spark layer adds no per-point work on the scoring path —
BENCH_SELF.json ``headline.stage_share.score`` ~0.99).

Each kernel also reports the hw probe (same fixed numpy loop bench.py uses)
so cross-round diffs can normalize out VM clock drift.

Usage: python scripts/kernel_bench.py [--quick]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault('OMP_NUM_THREADS', '1')
os.environ.setdefault('OPENBLAS_NUM_THREADS', '1')
os.environ.setdefault('MKL_NUM_THREADS', '1')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _series(n: int, channels: int = 0, seed: int = 42) -> np.ndarray:
    """Deterministic random-walk series with a few planted level shifts."""
    rng = np.random.default_rng(seed)
    shape = (n, channels) if channels else (n,)
    x = np.cumsum(rng.standard_normal(shape) * 0.1, axis=0)
    shift = np.zeros(shape)
    for pos in (n // 3, 2 * n // 3):
        shift[pos:] += rng.standard_normal(shape[1:] if channels else ()) * 5.0
    return x + shift


def _hw_probe() -> float:
    """bench.py's probe loop, so kernel numbers normalize against the same
    clock measurement the query bench records."""
    import bench
    return bench._hw_probe_work(None)


def kernel_cases(quick: bool):
    """(name, factory, series_len, channels). Lengths sized for ~2-6 s each
    on a quiet core; SST params mirror the headline pipeline, the other
    kernels mirror their contract queries in __spark_entry__.py."""
    from changepoynt_spark.kernels.sst import SST
    from changepoynt_spark.kernels.esst import ESST
    from changepoynt_spark.kernels.msst import MSST
    from changepoynt_spark.kernels.messt import MESST
    from changepoynt_spark.kernels.bocpd import BOCPD
    from changepoynt_spark.kernels.density_ratio import RuLSIF, ULSIF, KLIEP
    from changepoynt_spark.kernels.fluss import FLUSS

    s = 0.25 if quick else 1.0
    hp = dict(window_length=30, n_windows=30, lag=10, rank=2, scoring_step=2)
    return [
        ('sst_ika', lambda: SST(method='ika', **hp), int(120_000 * s), 0),
        ('sst_svd', lambda: SST(method='svd', **hp), int(60_000 * s), 0),
        ('sst_rsvd', lambda: SST(method='rsvd', **hp), int(40_000 * s), 0),
        ('sst_rsvd_fast_hankel',
         lambda: SST(window_length=128, n_windows=128, lag=40, rank=2,
                     scoring_step=8, method='rsvd', use_fast_hankel=True),
         int(60_000 * s), 0),
        ('sst_naive', lambda: SST(method='naive', **hp), int(20_000 * s), 0),
        ('sst_weighted', lambda: SST(method='weighted', **hp), int(20_000 * s), 0),
        ('esst_rsvd',
         lambda: ESST(window_length=30, n_windows=15, lag=15, rank=2,
                      scoring_step=2, method='rsvd'), int(40_000 * s), 0),
        ('msst_ika',
         lambda: MSST(window_length=12, n_windows=12, lag=4, rank=2,
                      scoring_step=2, method='ika'), int(40_000 * s), 3),
        ('messt_rsvd',
         lambda: MESST(window_length=12, n_windows=6, lag=6, rank=2,
                       scoring_step=2, method='rsvd'), int(30_000 * s), 3),
        ('bocpd', lambda: BOCPD(run_length=30), int(6_000 * s), 0),
        ('rulsif',
         lambda: RuLSIF(window_length=4, n_windows=8, scoring_step=2),
         int(4_000 * s), 0),
        ('ulsif',
         lambda: ULSIF(window_length=4, n_windows=8, scoring_step=4),
         int(8_000 * s), 0),
        ('kliep',
         lambda: KLIEP(window_length=4, n_windows=8, scoring_step=4,
                       estimation_lag=4), int(6_000 * s), 0),
        ('fluss', lambda: FLUSS(window_length=8), int(30_000 * s), 0),
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--quick', action='store_true')
    args = ap.parse_args()

    probe = round(_hw_probe(), 3)
    rows = []
    for name, factory, n, channels in kernel_cases(args.quick):
        series = _series(n, channels)
        # first call at a given size pays ~1 s of allocation/page-fault
        # first-touch for the step-batched arrays; production workers are
        # long-lived and score thousands of chunks, so steady state (the
        # second call) is the honest number — measured 17.7k vs 47.8k
        # pts/s/core cold-vs-warm for sst_ika at 30k points
        np.random.seed(2718)
        factory().transform(series)
        np.random.seed(2718)       # kernels with RNG draws stay deterministic
        t0 = time.perf_counter()
        scores = factory().transform(series)
        wall = time.perf_counter() - t0
        pts = int(scores.shape[0])
        rows.append({'kernel': name, 'points': pts, 'wall_sec': round(wall, 3),
                     'pts_per_sec_core': round(pts / wall, 1)})
        print(f'{name}: {pts} pts in {wall:.2f}s -> '
              f'{pts / wall:,.0f} pts/s/core', file=sys.stderr)

    out = {'hw_probe_sec': probe, 'single_thread': True,
           'results': {r['kernel']: {k: v for k, v in r.items() if k != 'kernel'}
                       for r in rows}}

    os.makedirs('BENCH', exist_ok=True)
    with open('BENCH/KERNELS.md', 'w') as f:
        f.write('# BENCH/KERNELS — per-kernel single-core throughput\n\n')
        f.write('Fixed deterministic series (seed 42, planted level shifts), '
                'BLAS pinned to 1 thread, no Spark.  pts/s/core x executor '
                'cores projects cluster throughput (score stage is ~99% of '
                'pipeline CPU per BENCH_SELF.json).  hw probe '
                f'{probe} s (same loop as bench.py; ~0.30 s on the quietest '
                'observed VM window — normalize cross-round by the ratio).\n\n')
        f.write('| kernel | points | wall (s) | pts/s/core |\n|---|---|---|---|\n')
        for r in rows:
            f.write(f"| {r['kernel']} | {r['points']} | {r['wall_sec']} | "
                    f"{r['pts_per_sec_core']:,} |\n")
        f.write('\nGenerator: `python scripts/kernel_bench.py`.\n')

    if os.path.exists('BENCH_SELF.json'):
        with open('BENCH_SELF.json') as f:
            bench = json.load(f)
        bench['kernels'] = out
        with open('BENCH_SELF.json', 'w') as f:
            json.dump(bench, f, indent=1, sort_keys=True)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
