"""Numpy oracle kernels — the correctness anchor of the engine.

These modules are pure numpy (no scipy/numba/fbpca/stumpy, none of which are
available here). The exact same code runs:

1. on the driver, to freeze golden score arrays (tests), and
2. inside Spark Arrow grouped-map UDFs (changepoynt_spark.operators.scoring),

so Spark-vs-oracle bit-equality is achievable under a per-series
deterministic seed.
"""
from changepoynt_spark.kernels.base import Algorithm, SingularSubspaceAlgorithm
from changepoynt_spark.kernels.baseline import ZERO, MovingWindow
from changepoynt_spark.kernels.bocpd import BOCPD
from changepoynt_spark.kernels.dead import (CLASP, FLOSS, TESST,
                                            SubspaceIdentification)
from changepoynt_spark.kernels.density_ratio import KLIEP, RuLSIF, ULSIF
from changepoynt_spark.kernels.esst import ESST
from changepoynt_spark.kernels.fluss import FLUSS
from changepoynt_spark.kernels.messt import MESST
from changepoynt_spark.kernels.msst import MSST
from changepoynt_spark.kernels.sst import SST

__all__ = [
    'Algorithm', 'SingularSubspaceAlgorithm', 'ZERO', 'MovingWindow', 'BOCPD',
    'CLASP', 'FLOSS', 'KLIEP', 'TESST', 'SubspaceIdentification', 'RuLSIF', 'ULSIF',
    'ESST', 'FLUSS', 'MESST', 'MSST', 'SST',
]
