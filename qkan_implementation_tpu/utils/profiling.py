"""Profiling: stage timers + jax.profiler integration.

The reference instruments with ad-hoc ``time.time()`` prints -- per-stage
breakdowns with percentages and memory footprint (``LCUStep.py:126-161``),
compute-time prints (``QKANLayer.py:203-244``).  This module keeps that
report shape but as a reusable component, and adds ``jax.profiler`` trace
annotation so stages show up on the TPU timeline.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class StageTimer:
    """Accumulate named stage durations; render the reference-style report.

    >>> timer = StageTimer()
    >>> with timer.stage("weights"): ...
    >>> with timer.stage("circuit"): ...
    >>> print(timer.report(memory_bytes=expected.nbytes))
    """

    def __init__(self, annotate_trace: bool = True):
        self.durations: Dict[str, float] = {}
        self.annotate_trace = annotate_trace

    @contextlib.contextmanager
    def stage(self, name: str):
        ctx = (
            jax.profiler.TraceAnnotation(name)
            if self.annotate_trace
            else contextlib.nullcontext()
        )
        start = time.perf_counter()
        with ctx:
            yield
        self.durations[name] = self.durations.get(name, 0.0) + (
            time.perf_counter() - start
        )

    @property
    def total(self) -> float:
        return sum(self.durations.values())

    def report(self, memory_bytes: Optional[int] = None) -> str:
        """Stage breakdown with percentages (the LCUStep.py:152-161 shape)."""
        lines = ["Breakdown of computation:"]
        total = self.total or 1e-30
        for name, dur in self.durations.items():
            lines.append(f"{name}: {dur:.4f}s ({dur / total * 100:.1f}%)")
        lines.append(f"Total: {total:.4f}s")
        if memory_bytes is not None:
            lines.append(f"Memory footprint: {memory_bytes / 1024 / 1024:.2f} MB")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler device trace around a block.

    View with TensorBoard or xprof; this is the upgrade path from the
    reference's print-based timing.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timeit_chained(fn, x, iters: int = 50, consts: tuple = ()) -> float:
    """Steady-state seconds/call of a shape-preserving ``x -> x`` function:
    slope timing over two device-side ``lax.scan`` chain lengths.

    ``consts``: large arrays the op needs besides ``x`` -- pass them HERE
    rather than closing over them: closed-over device arrays bake into the
    serialized program as constants, and the remote compiler rejects
    bodies past ~0.5 GB (HTTP 413 at 27 qubits).

    Two hazards this method removes (both measured on this environment):
    ``timeit_jit``'s ``block_until_ready`` can return before remote device
    work completes (an impossible 16 TB/s at 25 qubits), and a single
    chained run is dominated by the tunnel's ~25 ms fixed fetch cost
    (0.05 ms kernels read as 0.5 ms).  Chaining makes every step
    data-dependent; the (long - short) difference cancels the fixed cost.
    """
    import jax.numpy as jnp

    def make(n):
        @jax.jit
        def chain(x, *cs):
            def body(c, _):
                return fn(c, *cs), None

            final, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(jnp.abs(final))

        return chain

    short_n, long_n = iters, iters * 6
    c_short, c_long = make(short_n), make(long_n)
    _ = float(c_short(x, *consts))  # compile
    _ = float(c_long(x, *consts))
    t_short = min(
        _timed(lambda: float(c_short(x, *consts))) for _ in range(2)
    )
    t_long = min(
        _timed(lambda: float(c_long(x, *consts))) for _ in range(2)
    )
    slope = (t_long - t_short) / (long_n - short_n)
    # Noise floor: when the two chain timings are within measurement noise
    # the slope can be ~0 or negative, and callers would report absurd
    # ~1e12 ops/sec.  Fall back to the long chain's average per-step time
    # -- a safe UPPER bound on the true per-step cost (it still contains
    # 1/long_n of the fixed fetch cost, so it only overstates the time).
    floor = t_long / long_n / 50.0
    if slope < floor:
        return t_long / long_n
    return slope


def _timed(thunk) -> float:
    start = time.perf_counter()
    thunk()
    return time.perf_counter() - start


def timeit_jit(fn, *args, iters: int = 50, warmup: int = 2) -> float:
    """Steady-state seconds/call of a jitted function (blocks on the last
    result; dispatch pipelining is included, matching how throughput is
    experienced)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / iters
