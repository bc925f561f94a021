"""Metric functions addressable from configs as ``metrics.<name>``.

Reference: MML_Suite/metrics/ — configs declare dotted paths like
``metrics.msa_binary_classification``; the config loader aliases the bare
``metrics.`` prefix to this package (mmtpu/config/metrics.py).
"""

import sklearn.metrics.pairwise

from mmtpu.metrics.corr import pearson
from mmtpu.metrics.msa import (
    confusion_matrix_from_logits,
    mosei_regression,
    msa_binary_classification,
    old_mosei_regression,
)


def cosine_similarity(a, b, dense_output=True):
    """Mean pairwise cosine similarity (reference metrics/__init__.py:8)."""
    return sklearn.metrics.pairwise.cosine_similarity(a, b, dense_output).mean()


__all__ = [
    "pearson",
    "cosine_similarity",
    "msa_binary_classification",
    "confusion_matrix_from_logits",
    "mosei_regression",
    "old_mosei_regression",
]
