"""YAML -> dataclass experiment configuration.

Rebuild of ``Testing and Visualization Framework/config.py`` (reference
``:7-71``), including the ``feature_cols: auto`` expansion to
``feature_00..feature_78``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import yaml


@dataclass
class DataConfig:
    data_path: str
    n_rows: int
    train_ratio: float
    feature_cols: List[str]
    target_col: str
    weight_col: str
    date_col: str

    @classmethod
    def from_dict(cls, data: dict) -> "DataConfig":
        return cls(**data)


@dataclass
class ModelConfig:
    model_type: str
    network_shape: List[int]
    max_degree: Optional[int] = None
    complexity_weight: Optional[float] = None
    significance_threshold: Optional[float] = None
    hidden_dims: Optional[List[int]] = None
    learning_rate: Optional[float] = None
    batch_size: Optional[int] = None
    n_epochs: Optional[int] = None
    num_reads: Optional[int] = None  # annealer chains (reference default 1000)
    # cross-validated degree scoring over time folds, e.g.
    # {n_splits: 5, strategy: expanding}; None = plain in-sample scoring
    degree_cv: Optional[dict] = None
    # fixed_kan behavior bundle: 'reference' (faithful quirks) |
    # 'recommended' (documented fixes; the default) -- see
    # models.fixed_kan.FixedKANConfig.PRESETS
    preset: Optional[str] = None

    @classmethod
    def from_dict(cls, data: dict) -> "ModelConfig":
        return cls(**data)


@dataclass
class ExperimentConfig:
    name: str
    data: DataConfig
    models: List[ModelConfig]
    random_seed: int
    num_trials: int
    save_path: str
    log_path: str

    @classmethod
    def from_dict(cls, data: dict) -> "ExperimentConfig":
        return cls(
            name=data["name"],
            data=DataConfig.from_dict(data["data"]),
            models=[ModelConfig.from_dict(m) for m in data["models"]],
            random_seed=data["random_seed"],
            num_trials=data["num_trials"],
            save_path=data["save_path"],
            log_path=data["log_path"],
        )


def get_default_features() -> List[str]:
    return [f"feature_{i:02d}" for i in range(79)]


def load_config(path: str) -> ExperimentConfig:
    with open(path, "r") as f:
        config_dict = yaml.safe_load(f)
    if config_dict["data"]["feature_cols"] == "auto":
        config_dict["data"]["feature_cols"] = get_default_features()
    return ExperimentConfig.from_dict(config_dict)
