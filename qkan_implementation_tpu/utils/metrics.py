"""One metrics module for the whole framework.

The reference computes MSE and the weighted "competition R^2" in three
near-duplicate places with two latent bugs (an inverted R^2 formula at
``DegreeOptimizer.py:309`` computing ``1 - ss_tot/ss_res``, and an
``ss_tot == ss_res`` unweighted branch at ``TorchDegreeOptimizer.py:290-296``)
-- see SURVEY.md section 7.  This module is the single correct implementation:

  - ``r2_score``: standard coefficient of determination;
  - ``weighted_competition_r2``: the Jane-Street-style zero-mean weighted
    metric 1 - sum(w * (y - pred)^2) / sum(w * y^2), which is what the
    reference's logs actually report (train_utils.py:99-104).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _flatten(y_true, y_pred, weights=None):
    # float working dtype regardless of input (integer labels are valid
    # targets; jnp.finfo and the ratio math need an inexact dtype)
    ft = jnp.result_type(jnp.asarray(y_true).dtype, jnp.float32)
    y_true = jnp.asarray(y_true, dtype=ft).reshape(-1)
    y_pred = jnp.asarray(y_pred, dtype=ft).reshape(-1)
    if weights is not None:
        weights = jnp.asarray(weights, dtype=ft).reshape(-1)
    return y_true, y_pred, weights


def mse(y_true, y_pred, weights=None) -> float:
    """(Weighted) mean squared error."""
    y_true, y_pred, weights = _flatten(y_true, y_pred, weights)
    sq = (y_true - y_pred) ** 2
    if weights is None:
        return float(jnp.mean(sq))
    wsum = float(jnp.sum(weights))
    if wsum == 0.0:
        return 0.0  # degenerate all-zero weights: consistent with the R^2s
    return float(jnp.sum(weights * sq) / wsum)


def r2_score(y_true, y_pred, weights=None) -> float:
    """Coefficient of determination, weighted like sklearn's sample_weight."""
    y_true, y_pred, weights = _flatten(y_true, y_pred, weights)
    if weights is None:
        weights = jnp.ones_like(y_true)
    if float(jnp.sum(weights)) == 0.0:
        return 0.0  # degenerate all-zero weights (w_mean would be 0/0)
    w_mean = jnp.sum(weights * y_true) / jnp.sum(weights)
    ss_res = jnp.sum(weights * (y_true - y_pred) ** 2)
    ss_tot = jnp.sum(weights * (y_true - w_mean) ** 2)
    # SCALE-RELATIVE degeneracy test: an absolute eps threshold wrongly
    # zeroes small-magnitude targets (variance 5e-19 is meaningful when
    # the targets are ~1e-4); only a variance at rounding level of the
    # target energy is truly constant
    eps = jnp.finfo(y_true.dtype).eps
    scale = float(jnp.sum(weights * y_true**2))
    if float(ss_tot) <= float(eps) * max(scale, 0.0):
        return 0.0
    return float(1.0 - ss_res / ss_tot)


def weighted_competition_r2(y_true, y_pred, weights=None) -> float:
    """Zero-mean weighted R^2: 1 - sum(w*(y-pred)^2)/sum(w*y^2).

    The market-data metric in the reference logs (train_utils.py:99-104,
    output_result_250k_tail_corrected.txt:523).
    """
    y_true, y_pred, weights = _flatten(y_true, y_pred, weights)
    if weights is None:
        weights = jnp.ones_like(y_true)
    num = jnp.sum(weights * (y_true - y_pred) ** 2)
    den = jnp.sum(weights * y_true**2)
    if float(den) == 0.0:
        return 0.0
    return float(1.0 - num / den)


def compute_metrics(y_true, y_pred, weights=None) -> dict:
    """MSE + both R^2 flavors in one record (the shape the reference's
    ``_compute_metrics`` returns, DegreeOptimizer.py:277-313)."""
    return {
        "mse": mse(y_true, y_pred, weights),
        "r2": r2_score(y_true, y_pred, weights),
        "comp_r2": weighted_competition_r2(y_true, y_pred, weights),
    }
