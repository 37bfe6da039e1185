#!/usr/bin/env python
"""Round-9 optimization probes — SEPARATE from the frozen bench.py.

Modes:
  --profile q1,q2,...   run each query once; report wall split into
                        build (python driver code constructing the DF,
                        incl. table builds) vs count (the bench action),
                        plus per-Spark-job wall times from the UI REST API
  --plans q1,q2,... --out plans/r09 --suffix before
                        write .explain('formatted') for each query
  --time q1,...  [--n 3]  median-of-n end-to-end per-query wall (bench rule)

Uses the same session/config path as bench.py (make_session)."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
CPUS = int(os.environ.get('SPARK_GRAFT_CPUS', '32'))


def make_session():
    from changepoynt_spark.session import get_spark
    return get_spark(app_name=f'bench-extra-{CPUS}', master=f'local[{CPUS}]',
                     shuffle_partitions=max(2 * CPUS, 16),
                     extra_conf={'spark.ui.enabled': 'true'})


def _jobs_since(spark, start_job_id):
    """Jobs >= start_job_id from the UI REST API (localhost:4040)."""
    import urllib.request
    app_id = spark.sparkContext.applicationId
    base = f'http://localhost:4040/api/v1/applications/{app_id}/jobs'
    try:
        with urllib.request.urlopen(base, timeout=10) as r:
            jobs = json.loads(r.read())
    except Exception as e:
        return [{'error': str(e)}]
    out = []
    for j in jobs:
        if j['jobId'] < start_job_id:
            continue
        try:
            from datetime import datetime
            fmt = '%Y-%m-%dT%H:%M:%S.%fGMT'
            dur = (datetime.strptime(j['completionTime'], fmt)
                   - datetime.strptime(j['submissionTime'], fmt)).total_seconds()
        except Exception:
            dur = None
        out.append({'jobId': j['jobId'], 'sec': dur,
                    'desc': (j.get('description') or j.get('name', ''))[:110],
                    'stages': len(j.get('stageIds', []))})
    return sorted(out, key=lambda j: j['jobId'])


def profile(names):
    spark = make_session()
    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    sc = spark.sparkContext
    for name in names:
        prior = _jobs_since(spark, -1)
        start_job = 1 + max((j.get('jobId', -1) for j in prior), default=-1)
        t0 = time.perf_counter()
        sc.setJobDescription(f'{name}: build')
        df = qs[name](spark, SF_DIR)
        t1 = time.perf_counter()
        sc.setJobDescription(f'{name}: count')
        n = df.count()
        t2 = time.perf_counter()
        sc.setJobDescription(None)
        jobs = _jobs_since(spark, start_job)
        print(json.dumps({'query': name, 'rows': n,
                          'build_sec': round(t1 - t0, 3),
                          'count_sec': round(t2 - t1, 3),
                          'total_sec': round(t2 - t0, 3),
                          'n_jobs': len(jobs)}))
        for j in jobs:
            print(f"   job {j.get('jobId')}: {j.get('sec')}s "
                  f"stages={j.get('stages')} {j.get('desc')}")
    spark.stop()


def plans(names, out_dir, suffix):
    spark = make_session()
    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        p = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), 'formatted')
        path = os.path.join(out_dir, f'{name}_{suffix}.txt')
        with open(path, 'w') as f:
            f.write(p)
        print(f'wrote {path} ({len(p)} chars)')
    spark.stop()


def timeq(names, n):
    spark = make_session()
    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    out = {}
    for name in names:
        samples = []
        for _ in range(n):
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).count()
            samples.append(round(time.perf_counter() - t0, 3))
        out[name] = samples
        print(json.dumps({name: samples}))
    spark.stop()
    return out


if __name__ == '__main__':
    args = sys.argv[1:]

    def opt(flag, default=None):
        return args[args.index(flag) + 1] if flag in args else default
    if '--profile' in args:
        profile(opt('--profile').split(','))
    elif '--plans' in args:
        plans(opt('--plans').split(','), opt('--out', 'plans/r09'),
              opt('--suffix', 'before'))
    elif '--time' in args:
        timeq(opt('--time').split(','), int(opt('--n', '3')))
