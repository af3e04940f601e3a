"""Pitch-dependent dilation factors and frame→sample expansion.

Reference semantics: qpnet_train.py:147-179 (_dilated_factor/_batch_f0),
feature_extract.py:153-171 (extend_time).
"""

from __future__ import annotations

import numpy as np


def batch_f0(h: np.ndarray, f0_threshold: float = 0.0) -> np.ndarray:
    """Extract the continuous-F0 column (dim 1) from the aux feature matrix,
    clipped from below at ``f0_threshold`` (reference qpnet_train.py:165-179)."""
    cont_f0 = np.array(h[:, 1], dtype=np.float64, copy=True)
    cont_f0[cont_f0 < f0_threshold] = f0_threshold
    return cont_f0


def dilated_factor(f0: np.ndarray, fs: float, dense_factor: int) -> np.ndarray:
    """d(t) = fs / (f0(t) * dense_factor); unvoiced (f0==0) frames get d=1.

    Reference qpnet_train.py:147-163.
    """
    f0s = np.array(f0, dtype=np.float64, copy=True)
    f0s[f0s == 0] = fs / dense_factor
    d = np.full(f0s.shape, float(fs)) / f0s / dense_factor
    assert np.all(d > 0)
    return d


def extend_time(feats: np.ndarray, upsampling_factor: int) -> np.ndarray:
    """Frame-rate (T, D) → sample-rate (T*up, D) by repetition
    (reference feature_extract.py:153-171)."""
    return np.repeat(feats, upsampling_factor, axis=0)
