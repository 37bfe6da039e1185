"""Score plotting (API parity with the reference's
changepoynt/visualization/score_plotting.py:5-18).

matplotlib is not installed in this environment; the function is gated
behind an import-try so the engine package never hard-depends on it.
"""
from __future__ import annotations

import numpy as np


def plot_data_and_score(data: np.ndarray, score: np.ndarray, ax=None):
    """Overlay the change score on the signal (reference semantics: signal
    line + score contour on a twin axis)."""
    try:
        import matplotlib.pyplot as plt
    except ImportError as exc:  # pragma: no cover - matplotlib absent here
        raise NotImplementedError(
            'plot_data_and_score requires matplotlib, which is not installed '
            'in this environment.') from exc
    if ax is None:  # pragma: no cover
        _, ax = plt.subplots()
    ax.plot(data, label='signal')
    twin = ax.twinx()
    twin.plot(score, color='tab:red', alpha=0.7, label='change score')
    ax.set_xlabel('position')
    return ax
