"""API-parity stubs for the reference's dead/unfinished algorithms.

The reference ships these classes with constructors that raise
NotImplementedError and tests asserting the raise:

- FLOSS  (/root/reference/changepoynt/algorithms/floss.py:29,
          tests/test_floss.py:26-28) — streaming arc curve; true streaming in
          this engine lives in changepoynt_spark.streaming instead,
- CLASP  (/root/reference/changepoynt/algorithms/clasp.py:30,
          tests/test_clasp.py:26-28),
- SubspaceIdentification (/root/reference/changepoynt/algorithms/si.py:61,
          tests/test_si.py:26-28),
- KLIEP is listed as "Planned" in the reference (README.md:172) with no
  implementation — represented the same way here.
"""
from __future__ import annotations

from changepoynt_spark.kernels.base import Algorithm

_MSG = ('This algorithm is not implemented in the reference (constructor '
        'raises); kept for API parity.')


class FLOSS(Algorithm):
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(_MSG)

    def transform(self, time_series):
        raise NotImplementedError(_MSG)


class CLASP(Algorithm):
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(_MSG)

    def transform(self, time_series):
        raise NotImplementedError(_MSG)


class SubspaceIdentification(Algorithm):
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(_MSG)

    def transform(self, time_series):
        raise NotImplementedError(_MSG)


class KLIEP(Algorithm):
    def __init__(self, *args, **kwargs):
        raise NotImplementedError('KLIEP is "Planned" in the reference with no implementation.')

    def transform(self, time_series):
        raise NotImplementedError
