"""Does JAX's persistent compilation cache work on this backend?

Remote-tunnel compiles dominate structure-search wall-clock on this image
(identical flagship shapes measured 159 s vs 1,184 s across processes --
pure service-side variance).  A working persistent cache would make every
second process start warm.  This probe answers it empirically:

  run 1: compile a distinctive program with the cache dir set, time it
  run 2 (fresh process, same command): time the same compile

A large run-2 speedup (and a populated cache dir) means the PJRT plugin
honors the cache; no change means compilation happens service-side past
the cache's reach, and the honest answer is documented instead.

Run twice: PYTHONPATH=. python benchmarks/compile_cache_probe.py
Cache dir: QKAN_COMPILE_CACHE (default /tmp/qkan_jax_cache)
"""

from qkan_implementation_tpu.utils.platform import apply_platform_env

apply_platform_env()

import json
import os
import pathlib
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    cache_dir = os.environ.get("QKAN_COMPILE_CACHE", "/tmp/qkan_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    # a distinctive shape so no other benchmark's cache entry can collide
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1037, 253)), dtype=jnp.float32)

    @jax.jit
    def f(x):
        def body(c, _):
            c = jnp.tanh(c @ c.T[: c.shape[1], : c.shape[1]])
            return c, jnp.sum(c)
        return jax.lax.scan(body, x, None, length=7)[1]

    t0 = time.time()
    out = f(x)
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    entries = (
        sum(1 for _ in pathlib.Path(cache_dir).rglob("*"))
        if pathlib.Path(cache_dir).exists()
        else 0
    )
    print(
        json.dumps(
            {
                "device": str(jax.devices()[0]),
                "cache_dir": cache_dir,
                "first_call_s": round(compile_s, 2),
                "cache_entries_after": entries,
            }
        )
    )


if __name__ == "__main__":
    main()
