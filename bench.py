"""Headline benchmark: QKANLayer forward+backward throughput on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (from BASELINE.json): QKANLayer(N=16, K=16, degree=7) fused
forward+backward, batched.  The baseline is a reference-faithful NumPy
implementation of the same layer -- dense NK x NK diagonal matrices and the
per-element Python Chebyshev loop, exactly the algorithm of
``QKAN_Steps_original/QKANLayer.py:124-135`` / ``ChebyshevStep.py:32-65``
(forward only; it has no backward at all) -- measured in-process on this
machine's CPU.  ``vs_baseline`` is our layers/sec over its layers/sec.

Extra diagnostics go to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def reference_faithful_forward(x, weights, N, K):
    """The reference's algorithm, reproduced for timing: dense diagonals,
    per-element Chebyshev via cos/arccos in a Python loop."""
    max_degree = len(weights) - 1
    combined = np.zeros((N * K, N * K))
    for d in range(max_degree + 1):
        cheb_vals = np.array(
            [np.cos(d * np.arccos(np.clip(xi, -1, 1))) for xi in x]
        )
        dilated = np.diag(np.repeat(cheb_vals, K))
        weighted = np.diag(np.diag(dilated) * weights[d])
        combined += weighted / (max_degree + 1)
    lcu_diag = np.diag(combined)
    reshaped = lcu_diag.reshape(N, K, order="F")
    return np.sum(reshaped, axis=0) / N


def _walltime(thunk) -> float:
    start = time.time()
    thunk()
    return time.time() - start


def _tpu_is_healthy(timeout_s: float = 180.0) -> bool:
    """Probe TPU backend init in a subprocess with a hard timeout.

    The remote-tunnel backend, when down, blocks jax device init for ~25
    minutes of internal retries before erroring; probing in-process would
    take the whole bench with it.  A throwaway subprocess bounds the wait.
    """
    import subprocess

    try:
        out = subprocess.run(
            [
                sys.executable,
                "-c",
                "import jax; d=jax.devices()[0]; "
                "print('TPU-OK' if d.platform=='tpu' else d.platform)",
            ],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
        return "TPU-OK" in out.stdout
    except Exception:
        return False


def main():
    import os

    from qkan_implementation_tpu.utils.platform import apply_platform_env

    platform = apply_platform_env()  # QKAN_PLATFORM=cpu -> runnable TPU-down
    fallback = False
    if platform is None and not _tpu_is_healthy():
        # no explicit choice and the TPU backend won't come up (tunnel
        # outage): degrade to CPU with the smoke shapes rather than hang
        print(
            "TPU backend unhealthy; falling back to CPU smoke shapes",
            file=sys.stderr,
        )
        os.environ["BENCH_QUICK"] = "1"
        fallback = True
        from qkan_implementation_tpu.utils.platform import (
            disable_default_compile_cache,
        )

        # forcing cpu AFTER the default TPU cache dir was wired would
        # write XLA:CPU AOT entries into the shared dir (ADVICE r4)
        disable_default_compile_cache()
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from qkan_implementation_tpu.ops import qkan_layer_forward_batched

    N = K = 16
    d = 7
    quick = os.environ.get("BENCH_QUICK") == "1"  # CPU smoke-test mode
    B = 4096 if quick else 262144  # large B: MXU, not dispatch, limits
    rng = np.random.default_rng(0)
    x_np = rng.uniform(-1, 1, (B, N))
    w_np = rng.uniform(-1, 1, (d + 1, N * K))
    # 2x input POOL, rotated inside the scan body: with a single fixed x
    # the tanh/Chebyshev prefix depends only on loop-invariant data and
    # XLA hoists it OUT of the chain, so the slope times only the matmuls
    # (CLAUDE.md timing trap (b) -- the fix long applied to the flagship
    # train-step bench, now applied here too; earlier rounds' headline
    # over-reported by excluding the basis work from fwd+bwd).
    x_pool = jnp.asarray(
        np.stack([x_np, x_np[::-1]]), dtype=jnp.float32
    )  # [2, B, N]
    w = jnp.asarray(w_np, dtype=jnp.float32)

    def loss(w, x):
        return jnp.sum(qkan_layer_forward_batched(x, w, N, K) ** 2)

    grad = jax.grad(loss)

    # Timing methodology: a device-side scan chains dependent fwd+bwd steps
    # into ONE dispatch and a host fetch forces completion -- immune to
    # dispatch pipelining and to runtimes where block_until_ready returns
    # early (remote-tunnel backends).  Per-step time is the SLOPE over two
    # chain lengths, cancelling the tunnel's ~25 ms fixed fetch cost.
    iters = 20 if quick else 100
    # long chain must carry well over 150 ms of device work or the slope
    # is tunnel jitter (CLAUDE.md timing trap (a)); at the measured
    # ~0.16 ms/step, 12x = 1200 steps ~= 190 ms
    long_iters = iters * (6 if quick else 12)

    def make_chain(n):
        @jax.jit
        def chained(w, x_pool):
            def body(w, i):
                xi = jax.lax.dynamic_index_in_dim(
                    x_pool, i % 2, axis=0, keepdims=False
                )
                return w - 1e-7 * grad(w, xi), None

            return jnp.sum(
                jax.lax.scan(body, w, jnp.arange(n, dtype=jnp.int32))[0]
            )

        return chained

    c_short, c_long = make_chain(iters), make_chain(long_iters)
    t0 = time.time()
    _ = float(c_short(w, x_pool))
    _ = float(c_long(w, x_pool))
    compile_s = time.time() - t0
    print(f"device={jax.devices()[0]} compile={compile_s:.2f}s", file=sys.stderr)

    # Variance-aware headline (VERDICT r3 weak #4): repeat the slope
    # measurement 3x and report median + spread so round-over-round
    # deltas are interpretable against the tunnel's jitter band.
    reps = 1 if quick else 3
    per_steps = []
    noise_fallback_reps = 0
    for _rep in range(reps):
        t_short = min(
            _walltime(lambda: float(c_short(w, x_pool))) for _ in range(2)
        )
        t_long = min(
            _walltime(lambda: float(c_long(w, x_pool))) for _ in range(2)
        )
        slope = t_long - t_short
        if slope <= 0.05 * t_long:  # noise-dominated: safe upper bound
            noise_fallback_reps += 1
            print(
                f"rep {_rep}: slope noise-dominated "
                f"(t_short={t_short:.3f}s t_long={t_long:.3f}s); using "
                f"t_long/long_iters upper bound",
                file=sys.stderr,
            )
            per_steps.append(t_long / long_iters)
        else:
            per_steps.append(slope / (long_iters - iters))
    per_step = float(np.median(per_steps))
    spread_pct = (
        100.0 * (max(per_steps) - min(per_steps)) / per_step
        if per_step > 0
        else 0.0
    )
    ours_layers_per_sec = B / per_step
    print(
        f"ours: {ours_layers_per_sec:,.0f} fwd+bwd layers/sec "
        f"({per_step * 1e3:.3f} ms/step median of {reps} slope reps "
        f"{[round(p * 1e3, 3) for p in per_steps]} ms, spread "
        f"{spread_pct:.1f}%)",
        file=sys.stderr,
    )

    # statevector engine diagnostic (stderr only): multiplexed-Ry gate
    # applications per second at 21 qubits -- the FABLE hot op (VERDICT r1
    # item 3: keep a gate-ops/sec line with the headline bench)
    try:
        sv_q = 18 if quick else 21
        half = 2 ** (sv_q - 1)
        rng_sv = np.random.default_rng(1)
        cs = jnp.asarray(
            np.cos(rng_sv.uniform(-np.pi, np.pi, half) / 2), dtype=jnp.float32
        )
        sn = jnp.sqrt(1.0 - cs**2)
        psi_sv = jnp.zeros(2**sv_q, dtype=jnp.float32).at[0].set(1.0)
        on_tpu = jax.devices()[0].platform == "tpu"
        # chain long enough that the device work dominates the ~25 ms
        # tunnel fetch: at ~7 us/gate a 50/300 chain left the slope inside
        # run-to-run noise (observed 2-3x swings, incl. a >HBM-bandwidth
        # reading); 400/2400 puts ~17 ms of real work in the long chain
        gate_iters = 5 if quick else 400

        if on_tpu:
            from qkan_implementation_tpu.sim.pallas_kernels import (
                ucry_msb_cs_pallas_pair,
            )

            def one_gate(p):
                return ucry_msb_cs_pallas_pair(p, cs, sn)
        else:
            def one_gate(p):
                v = p.reshape(2, half)
                return jnp.concatenate(
                    [cs * v[0] - sn * v[1], sn * v[0] + cs * v[1]]
                )

        from qkan_implementation_tpu.utils.profiling import timeit_chained

        # timeit_chained falls back to the safe per-step upper bound when
        # the chain slope is noise-dominated, so dt is always sane
        dt = timeit_chained(one_gate, psi_sv, iters=gate_iters)
        bound = "~"
        gops = 1.0 / dt
        gbps = (2**sv_q) * 4 * 3 / dt / 1e9  # rd psi+cs/sn, wr psi
        print(
            f"statevector: {bound}{dt * 1e3:.3f} ms/gate multiplexed-Ry at "
            f"{sv_q} qubits ({gops:,.0f} gates/s, ~{gbps:.0f} GB/s "
            f"effective, slope-timed; above-HBM rates mean XLA kept the "
            f"8 MB scan carry in VMEM)",
            file=sys.stderr,
        )
    except Exception as e:  # diagnostics must never break the JSON contract
        print(f"statevector diagnostic skipped: {e}", file=sys.stderr)

    # baseline: reference-faithful NumPy forward (single sample at a time)
    base_iters = 5
    # correctness cross-check first
    got = np.asarray(
        qkan_layer_forward_batched(
            jnp.asarray(x_np[:1]), jnp.asarray(w_np), N, K
        )
    )[0]
    want = reference_faithful_forward(x_np[0], w_np, N, K)
    err = float(np.max(np.abs(got - want)))
    if err > 1e-5:
        print(f"WARNING: parity check err={err}", file=sys.stderr)
    t0 = time.time()
    for i in range(base_iters):
        reference_faithful_forward(x_np[i % B], w_np, N, K)
    base_layers_per_sec = base_iters / (time.time() - t0)
    print(
        f"reference-faithful numpy: {base_layers_per_sec:,.1f} layers/sec "
        f"(forward only)",
        file=sys.stderr,
    )

    record = {
        "metric": "QKANLayer(N=16,K=16,deg=7) fwd+bwd layers/sec",
        "value": round(ours_layers_per_sec, 1),
        "unit": "layers/sec",
        "vs_baseline": round(ours_layers_per_sec / base_layers_per_sec, 2),
        # workload version: guards cross-round comparability.  v1
        # (BENCH_r01-r03) re-read a FIXED input each scan step, letting
        # XLA hoist the tanh+Chebyshev prefix out of the timed chain; v2
        # (r04+) rotates a 2x input pool so the basis work is honestly
        # timed.  v1 and v2 numbers are NOT comparable (r4 measured
        # 1.67e9 v1 vs 1.32e9 v2 on the same program).
        "workload": "rotating-pool-v2",
        "spread_pct": round(spread_pct, 1),
    }
    if noise_fallback_reps:
        # per-rep slope was noise-dominated and the safe upper bound was
        # substituted -- mark it so a noisy rep is distinguishable from a
        # clean slope after the fact (VERDICT r4 weak #7)
        record["noise_fallback_reps"] = noise_fallback_reps
    if fallback:
        record["platform"] = "cpu-fallback (TPU backend unhealthy)"
    print(json.dumps(record))


if __name__ == "__main__":
    main()
