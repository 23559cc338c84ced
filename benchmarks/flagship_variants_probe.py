"""Post-collapse flagship train-step variants: where does 0.20 ms go?

After the o-collapse (kan_layer_apply pre-sums weights over outputs) the
flagship step dispatches only ~2.4 GFLOP, so it is bandwidth-bound; this
probe A/Bs the remaining traffic levers on-chip, slope-timed:

  f32         : the shipping path (baseline, flagship_train_step.json)
  f32_remat   : jax.checkpoint around the forward -- if XLA spills the
                [B, in*(D+1)] basis to HBM as a residual for the backward,
                remat trades that read+write for a cheap recompute
  bf16_basis  : x stored bf16, tanh+Chebyshev recurrence IN bf16, weights
                cast bf16, f32 accumulation -- halves every big-tensor
                byte (vs the shipping bf16io mode, which builds the basis
                in f32 and pays an extra cast pass over it)
  bf16_basis_remat : both levers

CAVEATS this probe itself surfaced (kept for the record):

- it trains on a FIXED batch, so XLA hoists the loop-invariant layer-0
  tanh+basis out of the timing scan -- absolute numbers here flatter a
  real training loop; the shipping bench (flagship_train_step.py) now
  rotates batch slices.  The probe's RELATIVE findings stand: remat
  loses (0.63 vs 0.31 ms -- XLA was not spilling), and bf16-throughout
  beats f32 with gradient cosine >= 0.9957.
- a 1200-step chain of ~25 us steps once read 0.025 ms/step, pure
  tunnel jitter; the re-measure with >=150 ms of work per long chain
  read 0.20 ms.  Chains must dwarf the jitter before slopes mean much.

Run: PYTHONPATH=. python benchmarks/flagship_variants_probe.py
     PYTHONPATH=. QKAN_PLATFORM=cpu python benchmarks/flagship_variants_probe.py --quick
"""

from qkan_implementation_tpu.utils.platform import apply_platform_env

apply_platform_env()

import argparse
import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from qkan_implementation_tpu.ops.chebyshev import chebyshev_basis
from benchmarks.flagship_train_step import (
    build_model,
    matmul_flops_per_step,
    slope_time,
)


def apply_variant(params, x, max_degree, basis_dtype=None, remat=False):
    """kan_apply with the probe's two extra knobs.

    basis_dtype: compute tanh+basis in this dtype (x cast once up front),
    weights cast to it, f32 accumulation.  None = exact f32.
    """

    def layer(lp, h):
        t = jnp.tanh(h)
        basis = chebyshev_basis(t, max_degree, clip=False)
        mask = (
            jnp.arange(max_degree + 1)[None, :] <= lp["degrees"][:, None]
        )
        coeffs = lp["coefficients"]
        hw = lp["horizontal_weights"]
        W = jnp.einsum(
            "oidt,od->idt", coeffs, mask.astype(coeffs.dtype) * hw[:, None]
        ).reshape(-1, coeffs.shape[-1])
        b = h.shape[0]
        if basis_dtype is None:
            return basis.reshape(b, -1) @ W
        return jax.lax.dot_general(
            basis.reshape(b, -1),
            W.astype(basis_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if remat:
        layer = jax.checkpoint(layer)

    h = x if basis_dtype is None else x.astype(basis_dtype)
    for lp in params:
        h = layer(lp, h)
        if basis_dtype is not None:
            h = h.astype(basis_dtype)
    return h.astype(jnp.float32)


def main():
    import optax

    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--batch", type=int, default=8192)
    args = ap.parse_args()

    shape = [784, 16, 10] if args.quick else [784, 32, 16, 16, 10]
    batch = 256 if args.quick else args.batch
    max_degree = 5
    kan = build_model(shape, max_degree, batch)
    t_dim = shape[-1]

    rng = np.random.default_rng(3)
    xb = jnp.asarray(rng.uniform(-1, 1, (batch, shape[0])).astype(np.float32))
    yb = jnp.asarray(
        np.eye(t_dim, dtype=np.float32)[rng.integers(0, t_dim, batch)]
    )
    degrees = [lp["degrees"] for lp in kan.params]
    train_params = [
        {k: v for k, v in lp.items() if k != "degrees"} for lp in kan.params
    ]
    opt = optax.adam(2e-3)
    flops, _ = matmul_flops_per_step(shape, max_degree, t_dim, batch)

    # remat variants measured 0.63/0.65 ms on v5e (2-3x WORSE than plain
    # f32): XLA was not spilling the basis, so remat only added recompute
    # passes.  Dropped from the default set; --all restores them.
    variants = {
        "f32": dict(basis_dtype=None, remat=False),
        "bf16_basis": dict(basis_dtype=jnp.bfloat16, remat=False),
    }
    if "--all" in __import__("sys").argv:
        variants["f32_remat"] = dict(basis_dtype=None, remat=True)
        variants["bf16_basis_remat"] = dict(
            basis_dtype=jnp.bfloat16, remat=True
        )
    results = {
        "workload": f"FixedKAN {shape} deg {max_degree} fwd+bwd+adam, "
        f"post-collapse traffic-lever shootout",
        "batch": batch,
        "device": str(jax.devices()[0]),
        "platform": jax.devices()[0].platform,
        "matmul_flops_per_step": flops,
    }
    for name, kw in variants.items():
        xin = (
            xb.astype(jnp.bfloat16)
            if kw["basis_dtype"] is not None
            else xb
        )

        def loss_fn(tp):
            params = [dict(p, degrees=d) for p, d in zip(tp, degrees)]
            logits = apply_variant(params, xin, max_degree, **kw)
            return jnp.mean(optax.softmax_cross_entropy(logits, yb))

        def step(carry):
            tp, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(tp)
            updates, opt_state = opt.update(grads, opt_state, tp)
            return optax.apply_updates(tp, updates), opt_state

        carry = (train_params, opt.init(train_params))
        # bf16_basis steps are ~25 us: 1000/6000 chains put >=150 ms of
        # real work in the long chain, keeping the slope above the
        # tunnel's run-to-run jitter
        short_n = 5 if args.quick else (1000 if "bf16" in name else 300)
        dt = slope_time(step, carry, short_n=short_n)
        results[name + "_step_ms"] = dt * 1e3
        print(f"{name}: {dt*1e3:.4f} ms/step", flush=True)

    out = pathlib.Path(__file__).resolve().parent / "records"
    out.mkdir(parents=True, exist_ok=True)
    (out / "flagship_variants_probe.json").write_text(
        json.dumps(results, indent=1)
    )
    print(f"record -> {out / 'flagship_variants_probe.json'}")


if __name__ == "__main__":
    main()
