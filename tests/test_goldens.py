"""Cross-session stability: the oracle must reproduce the frozen golden
score arrays bit-for-bit (FIXTURES.md §4).  Regenerate deliberately with
``python tests/make_goldens.py`` if kernel numerics change on purpose."""
import os

import numpy as np
import pytest

from tests.make_goldens import CELLS, GOLDEN_DIR, compute


@pytest.mark.parametrize('cell', [c[0] for c in CELLS])
def test_oracle_reproduces_frozen_golden(cell):
    path = os.path.join(GOLDEN_DIR, f'{cell}.npy')
    assert os.path.exists(path), f'missing golden {cell}; run tests/make_goldens.py'
    frozen = np.load(path)
    fresh = compute(cell)[cell]
    assert np.array_equal(fresh, frozen), f'{cell}: oracle drifted from frozen golden'
