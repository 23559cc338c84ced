"""On-chip parity probe for the Pallas fused layer at flagship shapes.

The CPU suite validates ops/fused_layer.py in interpret mode (pure jnp);
this probe checks the REAL Mosaic lowering on the TPU: forward and both
cotangents vs the XLA path, at exactly the shapes the flagship model
trains ([784 -> 10 targets] deg 5 first layer and the narrow deep layers),
in f32 and bf16.  Exit 1 on any mismatch beyond dtype-appropriate bounds.

Run: PYTHONPATH=. python benchmarks/fused_parity_probe.py
"""

from qkan_implementation_tpu.utils.platform import apply_platform_env

apply_platform_env()

import sys

import numpy as np
import jax
import jax.numpy as jnp

from qkan_implementation_tpu.models.fixed_kan import kan_layer_apply


def check(in_dim, out, T, D, batch, compute_dtype, tol_out, tol_grad):
    rng = np.random.default_rng(in_dim + out + batch)
    lp = {
        "degrees": jnp.asarray(
            rng.integers(0, D + 1, out), dtype=jnp.int32
        ),
        "coefficients": jnp.asarray(
            rng.normal(0, 0.3, (out, in_dim, D + 1, T)).astype(np.float32)
        ),
        "horizontal_weights": jnp.asarray(
            rng.normal(0, 1, out).astype(np.float32)
        ),
    }
    x = jnp.asarray(rng.uniform(-2, 2, (batch, in_dim)).astype(np.float32))
    y = jnp.asarray(rng.normal(0, 1, (batch, T)).astype(np.float32))
    degs = lp["degrees"]

    def loss(tp, x, backend):
        out_ = kan_layer_apply(
            dict(tp, degrees=degs), x, D, compute_dtype, backend
        )
        return jnp.mean((out_ - y) ** 2)

    tp = {k: v for k, v in lp.items() if k != "degrees"}
    fails = []
    fwd = {
        b: np.asarray(
            jax.jit(
                lambda tp, x, b=b: kan_layer_apply(
                    dict(tp, degrees=degs), x, D, compute_dtype, b
                )
            )(tp, x)
        )
        for b in ("xla", "fused")
    }
    scale = np.std(fwd["xla"]) + 1e-9
    d_out = float(np.max(np.abs(fwd["fused"] - fwd["xla"])) / scale)
    if d_out > tol_out:
        fails.append(f"forward rel dev {d_out:.3e} > {tol_out}")
    g = {
        b: jax.jit(jax.grad(loss, argnums=(0, 1)), static_argnums=2)(
            tp, x, b
        )
        for b in ("xla", "fused")
    }
    for name, a, bt in (
        ("dcoef", g["xla"][0]["coefficients"], g["fused"][0]["coefficients"]),
        (
            "dhw",
            g["xla"][0]["horizontal_weights"],
            g["fused"][0]["horizontal_weights"],
        ),
        ("dx", g["xla"][1], g["fused"][1]),
    ):
        a, bt = np.asarray(a), np.asarray(bt)
        sc = np.linalg.norm(a) + 1e-9
        cos = float(np.vdot(a, bt) / (np.linalg.norm(a) * np.linalg.norm(bt) + 1e-30))
        rel = float(np.linalg.norm(bt - a) / sc)
        if rel > tol_grad or cos < 0.99:
            fails.append(f"{name}: rel {rel:.3e} cos {cos:.4f}")
    tag = f"[{in_dim}->{out} T{T} D{D} B{batch} {compute_dtype or 'f32'}]"
    if fails:
        print(f"FAIL {tag}: " + "; ".join(fails))
        return False
    print(f"ok {tag} (fwd rel dev {d_out:.2e})")
    return True


CASES = {
    # name: (in, out, T, D, batch, compute_dtype, tol_out, tol_grad)
    "f32_wide_b64": (784, 32, 10, 5, 64, None, 1e-4, 1e-3),
    "f32_narrow_b64": (10, 16, 10, 5, 64, None, 1e-4, 1e-3),
    "f32_wide_b8192": (784, 32, 10, 5, 8192, None, 1e-4, 1e-3),
    "bf16_wide_b64": (784, 32, 10, 5, 64, jnp.bfloat16, 0.08, 0.1),
    "bf16_narrow_b64": (10, 16, 10, 5, 64, jnp.bfloat16, 0.08, 0.1),
    "bf16_wide_b8192": (784, 32, 10, 5, 8192, jnp.bfloat16, 0.08, 0.1),
}


def main():
    # remote compiles take minutes each (6 programs per case); allow
    # running one case at a time: `fused_parity_probe.py bf16_wide_b64`
    names = sys.argv[1:] or list(CASES)
    ok = True
    for name in names:
        ok &= check(*CASES[name])
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
