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
        # gate the DEFAULT cache on the RESOLVED platform, not just the
        # env var: the test harness / a caller may already have forced
        # jax_platforms='cpu' via jax.config, and wiring the shared TPU
        # cache dir there writes XLA:CPU AOT entries into it -- the exact
        # cross-host hazard the cpu-skip exists for (ADVICE r4)
        import jax

        resolved = jax.config.jax_platforms
        if not (resolved and str(resolved).split(",")[0] == "cpu"):
            cache = os.path.expanduser("~/.cache/qkan_jax_compile")
    if cache and cache != "0":
        import jax

        jax.config.update("jax_compilation_cache_dir", cache)
        # default thresholds skip tiny/fast compiles; on a remote-compile
        # backend EVERY compile pays the tunnel, so cache them all
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return value or None


def disable_default_compile_cache() -> None:
    """Unwire the DEFAULT persistent cache dir (explicit dirs stay).

    For callers that force ``jax_platforms='cpu'`` AFTER
    ``apply_platform_env()`` already wired the default TPU cache dir
    (bench.py's TPU-unhealthy fallback): without this, XLA:CPU AOT
    entries land in the shared ``~/.cache/qkan_jax_compile`` -- the
    cross-host SIGILL hazard the default cpu-skip avoids (ADVICE r4).
    An explicit ``QKAN_COMPILE_CACHE=<dir>`` choice is honored as-is.
    """
    if os.environ.get("QKAN_COMPILE_CACHE"):
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", None)
