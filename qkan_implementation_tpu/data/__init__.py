"""Data pipelines: market parquet (Jane Street-style) + MNIST/digits."""

from qkan_implementation_tpu.data.pipeline import (
    DataPipeline,
    generate_market_parquet,
)
from qkan_implementation_tpu.data.mnist import load_mnist, to_one_hot

__all__ = ["DataPipeline", "generate_market_parquet", "load_mnist", "to_one_hot"]
