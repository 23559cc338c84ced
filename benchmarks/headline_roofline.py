"""Roofline decomposition of the HONEST headline step (VERDICT r4 item 1b).

bench.py's rotating-pool-v2 workload times the full fwd+bwd+update step
including the tanh-free Chebyshev-basis work that the old fixed-input
workload let XLA hoist.  The honest step measured 0.197 ms vs the hoisted
0.157 ms (r4/r5); this probe answers WHERE the 0.04 ms lives and whether
any is recoverable:

  full        the bench.py step verbatim (rotating 2x pool)
  hoisted     fixed input (the old v1 workload): matmul-only bound
  fwd_full    forward-only rotating-pool step (one basis compute)
  fwd_hoisted forward-only fixed-input step
  basis_only  the basis recurrence + reduction, no dots (VPU cost scale)
  pallas_step grad step through ops.fused_layer.kan_layer_fused
              (apply_tanh=False): basis built once per tile in VMEM,
              fwd dot + both bwd products in-kernel
  degmajor    XLA variant with a degree-major basis concat (layout A/B)

Slope-timed (two chain lengths), 3 reps, same process/day so numbers are
comparable (the remote compiler drifts across days -- CLAUDE.md).

Run: PYTHONPATH=/root/.axon_site:. python benchmarks/headline_roofline.py
CPU smoke: QKAN_PLATFORM=cpu BENCH_QUICK=1 ... (tiny shapes, no claims)
"""

from qkan_implementation_tpu.utils.platform import apply_platform_env

apply_platform_env()

import json
import os
import pathlib
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from qkan_implementation_tpu.ops import qkan_layer_forward_batched
from qkan_implementation_tpu.ops.chebyshev import chebyshev_basis
from qkan_implementation_tpu.ops.qkan_layer import qkan_weight_tensor

try:  # PYTHONPATH=. python benchmarks/headline_roofline.py
    from benchmarks._slope import slope_time
except ImportError:  # python headline_roofline.py from benchmarks/
    from _slope import slope_time

QUICK = os.environ.get("BENCH_QUICK") == "1"
N = K = 16
D = 7
B = 4096 if QUICK else 262144
ITERS = 20 if QUICK else 100
LONG_MULT = 6 if QUICK else 12


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    rng = np.random.default_rng(0)
    x_np = rng.uniform(-1, 1, (B, N)).astype(np.float32)
    w_np = rng.uniform(-1, 1, (D + 1, N * K)).astype(np.float32)
    x_pool = jnp.asarray(np.stack([x_np, x_np[::-1]]))
    x_fixed = jnp.asarray(x_np)
    w = jnp.asarray(w_np)

    results = {"device": str(dev), "B": B, "N": N, "K": K, "D": D}

    # -- full honest step (bench.py body) ---------------------------------
    def loss(w, x):
        return jnp.sum(qkan_layer_forward_batched(x, w, N, K) ** 2)

    grad = jax.grad(loss)

    def make_full(n):
        @jax.jit
        def chained(w, pool):
            def body(w, i):
                xi = jax.lax.dynamic_index_in_dim(
                    pool, i % 2, axis=0, keepdims=False
                )
                return w - 1e-7 * grad(w, xi), None

            return jnp.sum(
                jax.lax.scan(body, w, jnp.arange(n, dtype=jnp.int32))[0]
            )

        return chained

    # -- hoisted (v1 fixed input) ------------------------------------------
    def make_hoisted(n):
        @jax.jit
        def chained(w, x):
            def body(w, _):
                return w - 1e-7 * grad(w, x), None

            return jnp.sum(
                jax.lax.scan(body, w, jnp.arange(n, dtype=jnp.int32))[0]
            )

        return chained

    # -- forward-only (rotating / fixed) -----------------------------------
    def make_fwd(n, rotate):
        @jax.jit
        def chained(w, pool):
            def body(carry, i):
                w, s = carry
                xi = (
                    jax.lax.dynamic_index_in_dim(
                        pool, i % 2, axis=0, keepdims=False
                    )
                    if rotate
                    else pool[0]
                )
                # dependence: w must consume s or XLA drops the chain
                wn = w + 1e-30 * s
                s2 = jnp.sum(qkan_layer_forward_batched(xi, wn, N, K) ** 2)
                return (wn, s2), None

            (wf, sf), _ = jax.lax.scan(
                body, (w, 0.0), jnp.arange(n, dtype=jnp.int32)
            )
            return sf + jnp.sum(wf)

        return chained

    # -- basis only ---------------------------------------------------------
    def make_basis(n):
        @jax.jit
        def chained(w, pool):
            def body(s, i):
                xi = jax.lax.dynamic_index_in_dim(
                    pool, i % 2, axis=0, keepdims=False
                )
                bas = chebyshev_basis(xi + 1e-30 * s, D)
                return jnp.sum(bas), None

            return jax.lax.scan(
                body, 0.0, jnp.arange(n, dtype=jnp.int32)
            )[0]

        return chained

    # -- pallas fused step ---------------------------------------------------
    # degree-major fold of the SAME contraction tensor: rows (d, n)
    from qkan_implementation_tpu.ops.fused_layer import kan_layer_fused

    interpret = dev.platform != "tpu"

    def fold_dm(w):
        M2 = qkan_weight_tensor(w, N, K).reshape(K, -1).T  # [(n,d), K]
        return (
            M2.reshape(N, D + 1, K).transpose(1, 0, 2).reshape(-1, K)
        )  # [(d,n), K]

    def loss_pl(w, x):
        return jnp.sum(
            kan_layer_fused(x, fold_dm(w), D + 1, interpret, False) ** 2
        )

    grad_pl = jax.grad(loss_pl)

    def make_pallas(n):
        @jax.jit
        def chained(w, pool):
            def body(w, i):
                xi = jax.lax.dynamic_index_in_dim(
                    pool, i % 2, axis=0, keepdims=False
                )
                return w - 1e-7 * grad_pl(w, xi), None

            return jnp.sum(
                jax.lax.scan(body, w, jnp.arange(n, dtype=jnp.int32))[0]
            )

        return chained

    # -- degree-major XLA layout A/B -----------------------------------------
    def fwd_dm(x, w):
        bas = chebyshev_basis(x, D)  # [B, N, D+1]
        b = x.shape[0]
        bas_dm = bas.transpose(0, 2, 1).reshape(b, -1)  # [(d, n)]
        return jnp.dot(bas_dm, fold_dm(w), preferred_element_type=bas.dtype)

    def loss_dm(w, x):
        return jnp.sum(fwd_dm(x, w) ** 2)

    grad_dm = jax.grad(loss_dm)

    def make_dm(n):
        @jax.jit
        def chained(w, pool):
            def body(w, i):
                xi = jax.lax.dynamic_index_in_dim(
                    pool, i % 2, axis=0, keepdims=False
                )
                return w - 1e-7 * grad_dm(w, xi), None

            return jnp.sum(
                jax.lax.scan(body, w, jnp.arange(n, dtype=jnp.int32))[0]
            )

        return chained

    # parity checks before timing (same math, reassociation tolerance)
    ref = np.asarray(
        qkan_layer_forward_batched(x_fixed[:64], w, N, K)
    )
    got_dm = np.asarray(fwd_dm(x_fixed[:64], w))
    err_dm = float(np.max(np.abs(got_dm - ref)))
    got_pl = np.asarray(
        kan_layer_fused(x_fixed[:64], fold_dm(w), D + 1, interpret, False)
    )
    err_pl = float(np.max(np.abs(got_pl - ref)))
    results["parity_degmajor_maxabs"] = err_dm
    results["parity_pallas_maxabs"] = err_pl
    print(f"parity: degmajor {err_dm:.2e}, pallas {err_pl:.2e}",
          file=sys.stderr)
    assert err_dm < 1e-4 and err_pl < 1e-3

    cases = [
        ("full", make_full, (w, x_pool)),
        ("hoisted", make_hoisted, (w, x_fixed)),
        ("fwd_full", lambda n: make_fwd(n, True), (w, x_pool)),
        ("fwd_hoisted", lambda n: make_fwd(n, False), (w, x_pool)),
        ("basis_only", make_basis, (w, x_pool)),
        ("degmajor", make_dm, (w, x_pool)),
        ("pallas_step", make_pallas, (w, x_pool)),
    ]
    for name, mk, args in cases:
        try:
            t0 = time.time()
            per, reps, noise = slope_time(
                mk, args, ITERS, LONG_MULT, reps=1 if QUICK else 3
            )
            results[name] = {
                "ms_per_step": round(per * 1e3, 4),
                "reps_ms": reps,
                "layers_per_sec": round(B / per, 0),
            }
            if noise:
                # upper-bound reps, not slopes (VERDICT r4 weak #7)
                results[name]["noise_fallbacks"] = noise
            print(
                f"{name:12s} {per * 1e3:8.4f} ms/step "
                f"({B / per:,.0f} layers/s)  reps={reps} "
                f"[compile+run {time.time() - t0:.0f}s]",
                file=sys.stderr,
            )
        except Exception as e:  # keep the sweep alive on one failure
            results[name] = {"error": repr(e)[:300]}
            print(f"{name:12s} FAILED: {e}", file=sys.stderr)

    # derived decomposition
    try:
        f = results["full"]["ms_per_step"]
        h = results["hoisted"]["ms_per_step"]
        results["derived"] = {
            "basis_plus_slice_overhead_ms": round(f - h, 4),
            "note": (
                "full - hoisted = the honestly-timed tanh-free basis "
                "(computed twice: fwd fusion + bwd fusion) + the pool "
                "slice; compare basis_only and fwd_full - fwd_hoisted "
                "for the single-compute scale"
            ),
        }
    except Exception:
        pass

    out = pathlib.Path(__file__).resolve().parent / "records"
    out.mkdir(parents=True, exist_ok=True)
    name = (
        "headline_roofline.json"
        if dev.platform == "tpu"
        else "headline_roofline_cpu.json"
    )
    (out / name).write_text(json.dumps(results, indent=1))
    print(f"records -> {out / name}", file=sys.stderr)
    print(json.dumps({k: v for k, v in results.items() if k != "derived"}))


if __name__ == "__main__":
    main()
