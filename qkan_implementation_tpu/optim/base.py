"""Shared optimizer plumbing: transform caching + time-series CV folds.

Rebuild of ``original_degree_optimizer/BaseOptimizer.py`` (reference
``:5-125``) with pandas/numpy in place of polars (the reference's polars
dependency; this environment, like many TPU images, ships pandas+pyarrow).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Dict, List, Tuple

import numpy as np


def _extract_features(x_data) -> np.ndarray:
    """Accept a pandas DataFrame (select ``feature_*`` columns, like the
    reference's ``^feature_.*$`` polars selector, BaseOptimizer.py:23) or a
    plain array."""
    if hasattr(x_data, "filter") and hasattr(x_data, "columns"):  # DataFrame
        feats = [c for c in x_data.columns if str(c).startswith("feature_")]
        if feats:
            return x_data[feats].to_numpy()
        return x_data.to_numpy()
    return np.asarray(x_data)


def _timestamp_values(timestamps, column: str = "date_id") -> np.ndarray:
    """Accept a DataFrame with a date column or a plain array of date ids."""
    if hasattr(timestamps, "columns"):
        return timestamps[column].to_numpy()
    return np.asarray(timestamps)


class BaseOptimizer(ABC):
    """Base class for QKAN optimizers implementing shared functionality."""

    def __init__(self):
        self.fold_caches: Dict = {}

    def _compute_collapsed_combinations(
        self, x_data, fold_id: str | None = None
    ) -> Dict[int, np.ndarray]:
        """Precompute (and cache per fold) the Chebyshev transform dict.

        Equivalent of BaseOptimizer._compute_collapsed_combinations
        (reference :12-28); the cache key hashes the underlying feature
        bytes rather than ``str(df)`` (the reference hashes a repr, which
        collides on elided rows).
        """
        feature_data = _extract_features(x_data)
        digest = hash(feature_data.tobytes())
        cache_key = f"{fold_id}_{digest}" if fold_id else digest
        if cache_key in self.fold_caches:
            return self.fold_caches[cache_key]
        transforms = self._compute_transforms(feature_data)
        self.fold_caches[cache_key] = transforms
        return transforms

    @abstractmethod
    def _compute_transforms(self, feature_data: np.ndarray) -> Dict[int, np.ndarray]:
        """Compute optimizer-specific transforms (child classes implement)."""

    def _get_expanding_window_folds(
        self,
        timestamps,
        data=None,
        n_splits: int = 5,
        initial_ratio: float = 0.6,
    ) -> List[Tuple[np.ndarray, np.ndarray]]:
        """Expanding-window CV folds over unique sorted date ids.

        Mirror of reference BaseOptimizer._get_expanding_window_folds
        (:38-69): train on the first ``initial + i*val_size`` dates, validate
        on the next ``val_size``.
        """
        ts = _timestamp_values(timestamps)
        unique = np.unique(ts)  # sorted
        n_times = len(unique)
        initial_train_size = int(n_times * initial_ratio)
        val_size = int((n_times - initial_train_size) / n_splits)

        folds = []
        for i in range(n_splits):
            train_end = initial_train_size + i * val_size
            train_times = unique[:train_end]
            val_times = unique[train_end : min(train_end + val_size, n_times)]
            folds.append(
                (np.isin(ts, train_times), np.isin(ts, val_times))
            )
        return folds

    def _get_time_based_folds(
        self, timestamps, data=None, n_splits: int = 5
    ) -> List[Tuple[np.ndarray, np.ndarray]]:
        """Time-based CV folds (reference BaseOptimizer :70-99)."""
        ts = _timestamp_values(timestamps)
        unique = np.unique(ts)
        n_times = len(unique)
        folds = []
        for i in range(n_splits):
            split_idx = int((i + 1) * n_times // (n_splits + 1))
            val_end_idx = int((i + 2) * n_times // (n_splits + 1))
            train_times = unique[:split_idx]
            val_times = unique[split_idx:val_end_idx]
            folds.append((np.isin(ts, train_times), np.isin(ts, val_times)))
        return folds

    def _compute_validation_score(
        self, predictions: np.ndarray, y_true: np.ndarray
    ) -> float:
        """MSE validation score (reference :100-111)."""
        return float(np.mean((np.asarray(y_true) - np.asarray(predictions)) ** 2))

    def save_state(self, filename: str) -> None:  # overridden by children
        pass

    def load_state(self, filename: str, current_query_params: dict) -> None:
        pass
