"""YAML-driven experiment harness (config, runner, evaluation, plots)."""

from qkan_implementation_tpu.experiments.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    get_default_features,
    load_config,
)
from qkan_implementation_tpu.experiments.evaluation import (
    ModelEvaluator,
    ModelResult,
)
from qkan_implementation_tpu.experiments.main import run_experiment

__all__ = [
    "DataConfig",
    "ModelConfig",
    "ExperimentConfig",
    "load_config",
    "get_default_features",
    "ModelResult",
    "ModelEvaluator",
    "run_experiment",
]
