"""Platform selection helper.

Some environments register a TPU PJRT plugin at interpreter start and force
``jax_platforms`` via jax.config, which silently overrides the
``JAX_PLATFORMS`` environment variable.  ``apply_platform_env()`` makes the
choice explicit again: set ``QKAN_PLATFORM=cpu`` (or ``tpu``) and call it
before first device use (all example scripts do).
"""

from __future__ import annotations

import os


def apply_platform_env(var: str = "QKAN_PLATFORM") -> str | None:
    """If the env var is set, force that platform via jax.config."""
    value = os.environ.get(var)
    if value:
        import jax

        jax.config.update("jax_platforms", value)
    return value or None
