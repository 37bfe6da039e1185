"""Drop-in import-path compatibility with the reference package: every
module path under changepoynt.{algorithms,utils} that the reference ships
resolves under changepoynt_spark.compat with the same class names."""
import importlib

import numpy as np
import pytest

REF_MODULES = {
    'algorithms.sst': 'SST', 'algorithms.esst': 'ESST',
    'algorithms.bocpd': 'BOCPD', 'algorithms.rulsif': 'RuLSIF',
    'algorithms.ulsif': 'ULSIF', 'algorithms.fluss': 'FLUSS',
    'algorithms.msst': 'MSST', 'algorithms.messt': 'MESST',
    'algorithms.clasp': 'CLASP', 'algorithms.floss': 'FLOSS',
    'algorithms.si': 'SubspaceIdentification',
    'algorithms.torch_esst': 'TESST',
    'algorithms.baseline': 'MovingWindow',
    'algorithms.base_algorithm': 'Algorithm',
    'utils.linalg': None, 'utils.block_linalg': None,
    'utils.normalization': None, 'utils.densityratioestimation': None,
}


@pytest.mark.parametrize('mod,cls', sorted(REF_MODULES.items()))
def test_reference_import_path_resolves(mod, cls):
    m = importlib.import_module(f'changepoynt_spark.compat.{mod}')
    if cls:
        assert hasattr(m, cls), f'{mod} missing {cls}'


def test_compat_classes_are_the_tested_kernels():
    from changepoynt_spark.compat.algorithms.sst import SST as CompatSST
    from changepoynt_spark.kernels import SST
    assert CompatSST is SST          # same object -> same goldens apply
    np.random.seed(3455)
    x = np.hstack([np.ones(80), 3 * np.ones(80)]) + 0.1 * np.random.rand(160)
    np.random.seed(7)
    s = CompatSST(30, rank=2, method='ika').transform(x)
    assert 60 <= int(np.argmax(s)) <= 100   # peak at the level shift
