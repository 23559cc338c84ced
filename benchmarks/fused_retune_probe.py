"""Fused-kernel schedule retune probe (VERDICT r4 items 1b + 5).

The r4 Mosaic drift left the fused layer kernel 16x off the honest XLA
headline step (headline_roofline.json: pallas_step 3.18 ms vs full
0.199 ms) and 1.45x behind XLA's bf16io class at the flagship shape
(flagship_train_step.json: 0.649 vs 0.447 ms).  Both gaps are schedule,
not algorithm: TILE_B=256 forces 1024 sequential grid steps of tiny work
at the headline batch, and the unconditional ``_dot_x3`` split triples
MXU work where the N=16 contract says one native pass is harmless.

This probe sweeps ``tile_b`` x ``precision`` for BOTH kernels against
same-process XLA baselines (the remote compiler drifts across days --
CLAUDE.md -- so only same-day A/Bs are comparable):

  headline  B=262144, N=16, K=16, D=7 (bench.py's rotating-pool-v2 shape,
            apply_tanh=False):
              xla_full          the honest XLA step (baseline)
              vjp[tb,prec]      kan_layer_fused custom-vjp grad step
              step[tb,prec]     kan_train_step_fused (basis built ONCE --
                                the only lever on the honest step's
                                0.042 ms basis-recompute overhead)
  flagship  B=8192, in=784, D+1=6, T=32 layer-0 grad step (apply_tanh
            =True):
              xla_high / xla_bf16io   baselines per precision class
              vjp[tb,'high'/'default'] fused f32-accurate / bf16 class

Run: PYTHONPATH=/root/.axon_site:. python benchmarks/fused_retune_probe.py
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
from qkan_implementation_tpu.ops.fused_layer import (
    kan_layer_fused,
    kan_layer_fused_dw,
    kan_train_step_fused,
)
from qkan_implementation_tpu.ops.qkan_layer import qkan_weight_tensor

try:  # PYTHONPATH=. python benchmarks/fused_retune_probe.py
    from benchmarks._slope import rotating_grad_chain, slope_time
except ImportError:  # python fused_retune_probe.py from benchmarks/
    from _slope import rotating_grad_chain, slope_time

QUICK = os.environ.get("BENCH_QUICK") == "1"
ITERS = 10 if QUICK else 60
LONG_MULT = 6 if QUICK else 12


def rotating_step_chain(step_fn):
    """Same rotating-pool honesty for a (loss, dW)-returning fused step."""

    def make(n):
        @jax.jit
        def chained(w, pool):
            def body(w, i):
                xi = jax.lax.dynamic_index_in_dim(
                    pool, i % 2, axis=0, keepdims=False
                )
                _, dw = step_fn(w, xi)
                return w - 1e-7 * dw, None

            return jnp.sum(
                jax.lax.scan(body, w, jnp.arange(n, dtype=jnp.int32))[0]
            )

        return chained

    return make


def run_case(results, name, make_chain, args):
    try:
        t0 = time.time()
        per, _, noise = slope_time(
            make_chain, args, ITERS, LONG_MULT, reps=1 if QUICK else 3
        )
        results[name] = round(per * 1e3, 4)
        if noise:
            # noise-dominated reps report an upper bound, not a slope --
            # mark it in the record (VERDICT r4 weak #7)
            results[f"{name}_noise_fallbacks"] = noise
        print(
            f"{name:28s} {per * 1e3:8.4f} ms/step  "
            f"[compile+run {time.time() - t0:.0f}s]"
            + (f"  [{noise} noise-fallback reps]" if noise else ""),
            file=sys.stderr,
        )
    except Exception as e:
        results[name] = {"error": repr(e)[:300]}
        print(f"{name:28s} FAILED: {e}", file=sys.stderr)


def headline_sweep(results, interpret):
    N = K = 16
    D = 7
    B = 4096 if QUICK else 262144
    rng = np.random.default_rng(0)
    x_np = rng.uniform(-1, 1, (B, N)).astype(np.float32)
    x_pool = jnp.asarray(np.stack([x_np, x_np[::-1]]))
    w = jnp.asarray(
        rng.uniform(-1, 1, (D + 1, N * K)).astype(np.float32)
    )

    def fold_dm(w):
        M2 = qkan_weight_tensor(w, N, K).reshape(K, -1).T
        return M2.reshape(N, D + 1, K).transpose(1, 0, 2).reshape(-1, K)

    # XLA honest baseline (bench.py body)
    def loss_xla(w, x):
        return jnp.sum(qkan_layer_forward_batched(x, w, N, K) ** 2)

    run_case(
        results, "headline_xla_full",
        rotating_grad_chain(jax.grad(loss_xla)), (w, x_pool),
    )

    tiles = [1024, 4096] if QUICK else [1024, 2048, 4096, 8192]
    for tb in tiles:
        if tb > B:
            continue
        for prec in ("default", "high"):
            def loss_pl(w, x, tb=tb, prec=prec):
                return jnp.sum(
                    kan_layer_fused(
                        x, fold_dm(w), D + 1, interpret, False,
                        prec, tb,
                    ) ** 2
                )

            run_case(
                results, f"headline_vjp_tb{tb}_{prec}",
                rotating_grad_chain(jax.grad(loss_pl)), (w, x_pool),
            )

            def step_pl(w, x, tb=tb, prec=prec):
                # degree-major parameterization: the fold is a fixed
                # permutation, so optimizing w2 directly is the same
                # trajectory; keep the fold outside the timed semantics
                return kan_train_step_fused(
                    x, w, D + 1, loss="sumsq", interpret=interpret,
                    apply_tanh=False, precision=prec, tile_b=tb,
                )

            run_case(
                results, f"headline_step_tb{tb}_{prec}",
                rotating_step_chain(step_pl), (fold_dm(w), x_pool),
            )

    # degree-wise v2 schedule (no basis concat).  Tiles are bounded by
    # Mosaic's lane padding: at n=16 every [tb, 16] temp is padded to
    # [tb, 128] (8x), and the unrolled recurrence keeps ~20 such temps
    # live on the stack -- tb4096 measured a 44.9 MB scoped allocation
    # (r5 sweep), so only <= 2048 compiles.
    for tb in ([1024] if QUICK else [1024, 2048]):
        if tb > B:
            continue

        def loss_dw(w, x, tb=tb):
            return jnp.sum(
                kan_layer_fused_dw(
                    x, fold_dm(w), D + 1, interpret, False,
                    "default", tb,
                ) ** 2
            )

        run_case(
            results, f"headline_dw_tb{tb}_default",
            rotating_grad_chain(jax.grad(loss_dw)), (w, x_pool),
        )


def flagship_sweep(results, interpret):
    IN, T, dp1 = 784, 32, 6
    B = 1024 if QUICK else 8192
    rng = np.random.default_rng(1)
    x_np = rng.uniform(-2, 2, (B, IN)).astype(np.float32)
    x_pool = jnp.asarray(np.stack([x_np, x_np[::-1]]))
    w2 = jnp.asarray(
        rng.normal(0, 0.05, (dp1 * IN, T)).astype(np.float32)
    )

    # XLA baselines: same math (tanh -> basis -> one collapsed matmul)
    def fwd_xla(w2, x, prec):
        t = jnp.tanh(x)
        bas = chebyshev_basis(t, dp1 - 1, clip=False)  # [B, in, dp1]
        bas_dm = bas.transpose(0, 2, 1).reshape(x.shape[0], -1)
        if prec == "bf16io":
            return jax.lax.dot_general(
                bas_dm.astype(jnp.bfloat16), w2.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return jnp.matmul(bas_dm, w2, precision=prec)

    for label, prec in [("xla_high", "high"), ("xla_bf16io", "bf16io")]:
        def loss_x(w2, x, prec=prec):
            return jnp.sum(fwd_xla(w2, x, prec) ** 2)

        run_case(
            results, f"flagship_{label}",
            rotating_grad_chain(jax.grad(loss_x)), (w2, x_pool),
        )

    tiles = [256] if QUICK else [256, 512, 1024]
    for tb in tiles:
        if tb > B:
            continue
        for prec in ("default", "high"):
            def loss_pl(w2, x, tb=tb, prec=prec):
                return jnp.sum(
                    kan_layer_fused(
                        x, w2, dp1, interpret, True, prec, tb
                    ) ** 2
                )

            run_case(
                results, f"flagship_vjp_tb{tb}_{prec}",
                rotating_grad_chain(jax.grad(loss_pl)), (w2, x_pool),
            )

    # degree-wise v2 schedule at wide fan-in: the [tb, 4704] basis concat
    # is gone, so tiles beyond the v1 OOM wall are reachable, and the
    # explicit 'bf16' mode chases XLA's bf16io class.  VMEM bound: ~7
    # [tb, 784] f32 recurrence temps -> tb 512 fits (11 MB), 1024 does
    # not (22 MB, measured OOM); 'high' triples dot operands -> 384 max.
    dw_cases = (
        [(256, "bf16")]
        if QUICK
        else [
            (256, "bf16"), (384, "bf16"), (512, "bf16"), (768, "bf16"),
            (512, "default"), (768, "default"),
            (256, "high"), (384, "high"),
        ]
    )
    for tb, prec in dw_cases:
        if tb > B:
            continue

        def loss_dw(w2, x, tb=tb, prec=prec):
            return jnp.sum(
                kan_layer_fused_dw(
                    x, w2, dp1, interpret, True, prec, tb
                ) ** 2
            )

        run_case(
            results, f"flagship_dw_tb{tb}_{prec}",
            rotating_grad_chain(jax.grad(loss_dw)), (w2, x_pool),
        )


def main():
    dev = jax.devices()[0]
    interpret = dev.platform != "tpu"
    print(f"device: {dev}", file=sys.stderr)
    results = {
        "device": str(dev),
        "platform": dev.platform,
        "quick": QUICK,
    }
    headline_sweep(results, interpret)
    flagship_sweep(results, interpret)

    out = pathlib.Path(__file__).resolve().parent / "records"
    out.mkdir(parents=True, exist_ok=True)
    name = (
        "fused_retune.json"
        if dev.platform == "tpu"
        else "fused_retune_cpu.json"
    )
    (out / name).write_text(json.dumps(results, indent=1))
    print(f"records -> {out / name}", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
