"""Correlation metrics (reference: metrics/corr.py:4)."""

import numpy as np


def pearson(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    return float(np.corrcoef(y_true, y_pred)[0][1])
