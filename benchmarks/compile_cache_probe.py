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
Cache dir: whatever ``apply_platform_env`` wired (QKAN_COMPILE_CACHE
override; production default ~/.cache/qkan_jax_compile) -- the probe
measures the SHIPPED cache wiring, not its own.
"""

from qkan_implementation_tpu.utils.platform import apply_platform_env

apply_platform_env()

import json
import pathlib
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    # probe exactly what apply_platform_env configured: a divergent local
    # default here would validate a cache nobody ships, and '0' (disable)
    # must probe as disabled, not as a directory literally named "0"
    cache_dir = jax.config.jax_compilation_cache_dir
    if not cache_dir:
        print(
            json.dumps(
                {
                    "device": str(jax.devices()[0]),
                    "cache_dir": None,
                    "note": "persistent cache disabled "
                    "(QKAN_COMPILE_CACHE=0 or forced-cpu default); "
                    "nothing to probe",
                }
            )
        )
        return

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
