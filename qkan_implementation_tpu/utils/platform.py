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
    """If the env var is set, force that platform via jax.config.

    Also enables JAX's persistent compilation cache (measured working
    THROUGH the remote-compile tunnel on this image: a second process's
    compile of the same program dropped 0.72 s -> 0.09 s,
    ``benchmarks/compile_cache_probe.py`` r4).  Remote compiles of the
    flagship structure search measured 159 s vs 1,184 s across processes
    for IDENTICAL shapes -- the cache turns every repeat run warm.
    ``QKAN_COMPILE_CACHE`` overrides the directory; set it to ``0`` to
    disable.  The DEFAULT cache is skipped when the platform is forced to
    ``cpu``: CPU compiles are subsecond (nothing to save) and XLA:CPU
    cache entries are AOT results keyed to the compiling machine's
    feature set -- a home dir shared across heterogeneous hosts serves
    mismatched AOT code (observed loader warnings threatening SIGILL).
    An explicit ``QKAN_COMPILE_CACHE=<dir>`` is always honored.
    """
    value = os.environ.get(var)
    if value:
        import jax

        jax.config.update("jax_platforms", value)

    cache = os.environ.get("QKAN_COMPILE_CACHE")
    if cache is None and value != "cpu":
        cache = os.path.expanduser("~/.cache/qkan_jax_compile")
    if cache and cache != "0":
        import jax

        jax.config.update("jax_compilation_cache_dir", cache)
        # default thresholds skip tiny/fast compiles; on a remote-compile
        # backend EVERY compile pays the tunnel, so cache them all
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return value or None
