"""SparkSession factory with engine defaults.

Arrow on (all kernel execution crosses the JVM->Python boundary as Arrow
batches), AQE on (runtime skew-join/partition coalescing), shuffle
partitions sized for the local harness but overridable for cluster runs.
"""
from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = 'changepoynt-spark', master: str = None,
              shuffle_partitions: int = None, extra_conf: dict = None) -> SparkSession:
    # one BLAS thread per Python worker: parallelism comes from Spark tasks;
    # multi-threaded BLAS on the kernels' tiny gemms only causes contention
    for var in ('OMP_NUM_THREADS', 'OPENBLAS_NUM_THREADS', 'MKL_NUM_THREADS',
                'VECLIB_MAXIMUM_THREADS', 'NUMEXPR_NUM_THREADS'):
        os.environ.setdefault(var, '1')
    cpus = int(os.environ.get('SPARK_GRAFT_CPUS', '32'))
    master = master or f'local[{cpus}]'
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 32)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config('spark.sql.shuffle.partitions', str(shuffle_partitions))
        .config('spark.sql.adaptive.enabled', 'true')
        .config('spark.sql.adaptive.coalescePartitions.enabled', 'true')
        # AQE's coalescing targets BYTES per partition (1 MiB floor by
        # default) — the wrong cost proxy for CPU-heavy kernel stages, where
        # a 100 KB partition of token arrays is seconds of numpy.  Lowering
        # the floor keeps small-SF shuffles spread across the cores; at
        # cluster scale partitions are far above either floor, so this is a
        # no-op there.
        .config('spark.sql.adaptive.coalescePartitions.minPartitionSize', '64k')
        .config('spark.sql.adaptive.skewJoin.enabled', 'true')
        .config('spark.sql.execution.arrow.pyspark.enabled', 'true')
        .config('spark.sql.execution.arrow.maxRecordsPerBatch', '1024')
        .config('spark.driver.memory', os.environ.get('SPARK_DRIVER_MEMORY', '8g'))
        .config('spark.sql.session.timeZone', 'UTC')
        # INT64 micros, not legacy INT96: INT96 carries NO parquet footer
        # min/max, which blinds the manifest-stats scan planning
        # (IcebergishTable.plan_files / expire_before) on every
        # engine-written TIMESTAMP column.  NTZ columns already write
        # INT64; this aligns LTZ with them (and with what Iceberg requires)
        .config('spark.sql.parquet.outputTimestampType', 'TIMESTAMP_MICROS')
        .config('spark.ui.enabled', 'false')
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
