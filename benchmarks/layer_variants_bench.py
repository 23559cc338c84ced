"""Headline-layer implementation shootout on real hardware.

VERDICT r1 item 5: the round-1 headline (one [B, N(D+1)] @ [N(D+1), K]
matmul) leaves the MXU at ~12% lane occupancy and pays HBM traffic for a
Chebyshev basis array that never needed to exist.  This benchmark times the
candidate implementations of QKANLayer(N=16, K=16, deg 7) fwd+bwd with the
scan-chained methodology (one dispatch, host fetch forces completion):

  xla      -- round-1 baseline: basis materialized, XLA dot
  remat    -- jax.checkpoint on the basis (recompute in backward)
  bf16     -- bf16 basis + matmul, f32 accumulation
  pallas   -- fused VMEM kernel (experimental.pallas_layer, kept negative result): HBM sees only x/out

Writes benchmarks/records/layer_variants.json; bench.py's default path is
chosen from these numbers.

Run: PYTHONPATH=. python benchmarks/layer_variants_bench.py          (TPU)
     PYTHONPATH=. QKAN_PLATFORM=cpu BENCH_QUICK=1 python benchmarks/layer_variants_bench.py
"""

from qkan_implementation_tpu.utils.platform import apply_platform_env

apply_platform_env()

import json
import os
import pathlib
import time

import numpy as np
import jax
import jax.numpy as jnp

from qkan_implementation_tpu.ops.chebyshev import chebyshev_basis
from qkan_implementation_tpu.ops.qkan_layer import (
    qkan_layer_forward_batched,
    qkan_layer_forward_batched_int8,
    qkan_weight_tensor,
)
from qkan_implementation_tpu.experimental.pallas_layer import (
    qkan_layer_fused,
    weights_to_m3,
)
from qkan_implementation_tpu.ops.fused_layer import kan_layer_fused


def make_variants(N, K, interpret):
    def xla(x, w):
        return qkan_layer_forward_batched(x, w, N, K)

    def remat(x, w):
        M = qkan_weight_tensor(w, N, K)

        @jax.checkpoint
        def basis_dot(x):
            basis = chebyshev_basis(x, w.shape[0] - 1)
            return jnp.dot(
                basis.reshape(x.shape[0], -1),
                M.reshape(K, -1).T,
                preferred_element_type=basis.dtype,
            )

        return basis_dot(x)

    def bf16(x, w):
        M = qkan_weight_tensor(w, N, K)
        basis = chebyshev_basis(x.astype(jnp.bfloat16), w.shape[0] - 1)
        return jnp.dot(
            basis.reshape(x.shape[0], -1),
            M.reshape(K, -1).T.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

    def pallas(x, w):
        return qkan_layer_fused(x, weights_to_m3(w, N, K), interpret)

    def fused(x, w):
        # the PRODUCTION VMEM-basis kernel (ops/fused_layer, the flagship
        # trainer's 11.1x path) in raw-Chebyshev mode: degree-major weight
        # fold, apply_tanh=False keeps qkan_layer_forward_batched semantics.
        # The r4 roofline question: the bf16io K=128 fwd+bwd chain is HBM-
        # bound on basis + out/dout round trips (~400 MB/step predicts the
        # measured 0.48 ms); this kernel removes the basis traffic.
        M = qkan_weight_tensor(w, N, K)  # [K, N, D+1]
        w2 = M.transpose(2, 1, 0).reshape(-1, K)  # degree-major [dp1*N, K]
        return kan_layer_fused(x, w2, w.shape[0], interpret, False)

    def fused_bf16io(x, w):
        # x arrives bf16 (data-pipeline cast): the kernel's recurrence and
        # fwd dot then run native-bf16 with f32 accumulation
        M = qkan_weight_tensor(w, N, K)
        w2 = M.transpose(2, 1, 0).reshape(-1, K)
        return kan_layer_fused(x, w2, w.shape[0], interpret, False)

    def bf16io(x, w):
        # mixed-precision recipe: x arrives ALREADY bf16 (cast outside the
        # step; input precision is a data-pipeline choice), so the per-step
        # cast cost that sinks the 'bf16' variant disappears -- only the
        # tiny [D+1, N*K] weight tensor casts per step, and the dot runs
        # native-bf16 on the MXU with f32 accumulation.  This is the
        # first-class API path: compute_dtype=bfloat16.
        return qkan_layer_forward_batched(
            x, w, N, K, compute_dtype=jnp.bfloat16
        )

    return {
        "xla": xla, "remat": remat, "bf16": bf16, "bf16io": bf16io,
        "pallas": pallas, "fused": fused, "fused_bf16io": fused_bf16io,
    }


def time_variant(name, fn, x, w, iters):
    def loss(w, x):
        return jnp.sum(fn(x, w) ** 2)

    grad = jax.grad(loss)

    @jax.jit
    def chained(w, x):
        def body(w, _):
            return w - 1e-7 * grad(w, x), None

        return jax.lax.scan(body, w, None, length=iters)[0]

    t0 = time.time()
    out = chained(w, x)
    _ = float(jnp.sum(out))
    compile_s = time.time() - t0
    t0 = time.time()
    out = chained(w, x)
    _ = float(jnp.sum(out))
    exec_s = time.time() - t0
    layers_per_sec = x.shape[0] * iters / exec_s
    print(
        f"  {name:8s} {layers_per_sec:.3e} layers/s "
        f"({exec_s / iters * 1e3:.3f} ms/step, compile {compile_s:.1f}s)"
    )
    return {
        "variant": name,
        "layers_per_sec": layers_per_sec,
        "ms_per_step": exec_s / iters * 1e3,
        "compile_s": round(compile_s, 2),
    }


def time_variant_forward(name, fn, x, w, iters):
    """Forward-only (serving) chain: each step's output feeds an
    un-foldable 1e-30-scaled perturbation of the weights, so the scan is
    a genuine dependent chain without changing any value in f32."""

    @jax.jit
    def chained(w, x):
        def body(w, _):
            out = fn(x, w)
            return w + 1e-30 * jnp.mean(out).astype(w.dtype), None

        return jax.lax.scan(body, w, None, length=iters)[0]

    t0 = time.time()
    _ = float(jnp.sum(chained(w, x)))
    compile_s = time.time() - t0
    t0 = time.time()
    _ = float(jnp.sum(chained(w, x)))
    exec_s = time.time() - t0
    layers_per_sec = x.shape[0] * iters / exec_s
    print(
        f"  {name:8s} {layers_per_sec:.3e} layers/s fwd-only "
        f"({exec_s / iters * 1e3:.3f} ms/step, compile {compile_s:.1f}s)"
    )
    return {
        "variant": name,
        "mode": "forward_only",
        "layers_per_sec": layers_per_sec,
        "ms_per_step": exec_s / iters * 1e3,
        "compile_s": round(compile_s, 2),
    }


def run_forward_shootout(N, K, d, B, iters, x, w):
    """f32 vs bf16io vs int8 forward-only: the serving-path question."""
    print(f"forward-only (serving) shootout, B={B}:")
    variants = {
        "xla": lambda x, w: qkan_layer_forward_batched(x, w, N, K),
        "bf16io": lambda x, w: qkan_layer_forward_batched(
            x, w, N, K, compute_dtype=jnp.bfloat16
        ),
        "int8": lambda x, w: qkan_layer_forward_batched_int8(x, w, N, K),
    }
    ref = np.asarray(qkan_layer_forward_batched(x[:512], w, N, K))
    records = []
    for name, fn in variants.items():
        xv = x.astype(jnp.bfloat16) if name == "bf16io" else x
        got = np.asarray(fn(xv[:512], w)).astype(np.float32)
        err = float(np.max(np.abs(got - ref)))
        tol = 5e-2 if name != "xla" else 1e-6
        assert err < tol, f"{name}: parity error {err}"
        rec = time_variant_forward(name, fn, xv, w, iters)
        rec["parity_max_err"] = err
        rec["batch"] = B
        rec["device"] = str(jax.devices()[0])
        records.append(rec)
    return records


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--K", type=int, default=16, help="output width (16 = the reference workload; 128 fills the MXU lanes)")
    ap.add_argument("--N", type=int, default=16, help="input width (8 = the BASELINE north-star small point)")
    ap.add_argument("--forward-only", action="store_true",
                    help="serving shootout: f32/bf16io/int8 forward-only")
    args = ap.parse_args()
    N = args.N
    K = args.K
    d = 7
    quick = os.environ.get("BENCH_QUICK") == "1"
    B = 4096 if quick else 262144
    iters = 10 if quick else 200
    on_tpu = jax.devices()[0].platform == "tpu"
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B, N)), dtype=jnp.float32)
    w = jnp.asarray(rng.uniform(-1, 1, (d + 1, N * K)), dtype=jnp.float32)

    if args.forward_only:
        records = run_forward_shootout(N, K, d, B, iters, x, w)
        out = pathlib.Path(__file__).resolve().parent / "records"
        out.mkdir(parents=True, exist_ok=True)
        name = f"layer_variants_fwd_N{N}K{K}.json"
        (out / name).write_text(json.dumps(records, indent=1))
        print(f"records -> {out / name}")
        return

    print(
        f"QKANLayer(N={N},K={K},deg={d}) fwd+bwd, B={B}, {iters} chained "
        f"steps on {jax.devices()[0]}"
    )
    if K != 16:
        print(
            f"  (K={K}: MXU-lane-occupancy probe; the reference workload is K=16)"
        )
    # correctness gate first: every variant must match the reference path
    ref = np.asarray(qkan_layer_forward_batched(x[:512], w, N, K))
    records = []
    for name, fn in make_variants(N, K, interpret=not on_tpu).items():
        xv = x.astype(jnp.bfloat16) if name.endswith("bf16io") else x
        got = np.asarray(fn(xv[:512], w)).astype(np.float32)
        err = float(np.max(np.abs(got - ref)))
        tol = 5e-2 if "bf16" in name else 1e-5
        assert err < tol, f"{name}: parity error {err}"
        rec = time_variant(name, fn, xv, w, iters)
        rec["parity_max_err"] = err
        rec["batch"] = B
        rec["device"] = str(jax.devices()[0])
        records.append(rec)

    out = pathlib.Path(__file__).resolve().parent / "records"
    out.mkdir(parents=True, exist_ok=True)
    name = (
        "layer_variants.json"
        if (N, K) == (16, 16)
        else f"layer_variants_N{N}K{K}.json"
    )
    # quick smoke runs must never clobber the committed TPU records
    if quick:
        name = f"QUICK_{name}"
    (out / name).write_text(json.dumps(records, indent=1))
    print(f"records -> {out / name}")


if __name__ == "__main__":
    main()
