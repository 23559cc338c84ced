"""Shared slope-timing helpers for the benchmark probes.

One implementation of the two-chain-length slope method (see bench.py and
``utils.profiling.timeit_chained`` for why naive timing lies on the
remote-tunnel TPU backend), so methodology fixes -- the noise-fallback
marker, the >=150 ms long-chain rule, chain construction -- live in one
place instead of drifting across probe scripts (r5 review finding).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def walltime(thunk) -> float:
    t0 = time.time()
    thunk()
    return time.time() - t0


def slope_time(make_chain, args, iters, long_mult, reps=3):
    """Median per-step slope over two chain lengths (bench.py method).

    ``make_chain(n)`` must return a jitted callable whose result is
    fetched with ``float(...)`` (the scalar fetch ends the chain).
    Returns ``(median_s, per_rep_ms, noise_fallbacks)`` --
    ``noise_fallbacks`` counts reps whose slope was below 5% of the long
    chain's wall time, where the returned value is the t_long/long_iters
    UPPER BOUND rather than a trustworthy slope (callers should surface
    this in their records; silent substitution was VERDICT r4 weak #7).
    """
    long_iters = iters * long_mult
    c_short, c_long = make_chain(iters), make_chain(long_iters)
    float(c_short(*args))  # compile
    float(c_long(*args))
    per, noise = [], 0
    for _ in range(reps):
        ts = min(walltime(lambda: float(c_short(*args))) for _ in range(2))
        tl = min(walltime(lambda: float(c_long(*args))) for _ in range(2))
        slope = tl - ts
        if slope <= 0.05 * tl:
            noise += 1
            per.append(tl / long_iters)
        else:
            per.append(slope / (long_iters - iters))
    return (
        float(np.median(per)),
        [round(p * 1e3, 4) for p in per],
        noise,
    )


def rotating_grad_chain(grad_fn, lr=1e-7):
    """bench.py's honest rotating-pool train step as a chain factory.

    Each step consumes a DIFFERENT slice of a 2x input pool so the
    input-dependent prefix (tanh + Chebyshev basis) cannot be hoisted out
    of the timed scan (the fixed-input-v1 trap, docs/benchmarks.md).
    """

    def make(n):
        @jax.jit
        def chained(w, pool):
            def body(w, i):
                xi = jax.lax.dynamic_index_in_dim(
                    pool, i % 2, axis=0, keepdims=False
                )
                return w - lr * grad_fn(w, xi), None

            return jnp.sum(
                jax.lax.scan(body, w, jnp.arange(n, dtype=jnp.int32))[0]
            )

        return chained

    return make
