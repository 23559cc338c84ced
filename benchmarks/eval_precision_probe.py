"""Is the residual TPU quality gap in the INFERENCE forward?

r4 on-chip bands: with training matmuls pinned ('high'), TPU and CPU reach
the SAME final training loss (~0.21) yet report different accuracies
(train 0.86 vs 0.93) -- and the loss is computed inside the pinned
training scan while accuracy runs the serving forward at the device
default (ONE bf16 pass).  At the flagship first layer the contraction is
F = 784*(D+1) = 4704 terms: per-term bf16 rounding (~4e-3 relative) over
thousands of partially-cancelling terms can shift logits by percents,
flipping argmax near decision boundaries -- invisible at the N=16
contract scale (1.1e-5, tpu_contracts.py).

This probe trains ONE flagship cell (the reproducible evidence recipe),
then evaluates the SAME parameters twice: device-default forward vs
precision-pinned forward.  A material accuracy delta convicts the
inference path; parity acquits it.

Run: PYTHONPATH=. python benchmarks/eval_precision_probe.py [--seed 2]
"""

from qkan_implementation_tpu.utils.platform import apply_platform_env

apply_platform_env()

import argparse
import json
import pathlib

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=2,
                    help="2 = the weakest seed of the r4 TPU 3-seed band")
    ap.add_argument("--train-size", type=int, default=10000)
    args = ap.parse_args()

    from qkan_implementation_tpu.data.mnist import (
        load_digits_784,
        sample_train_subset,
        to_one_hot,
    )
    from qkan_implementation_tpu.models import FixedKAN, FixedKANConfig

    x_train_full, y_train_full, meta = load_digits_784(
        train=True, augment_to=args.train_size, seed=args.seed
    )
    x_test, y_test, _ = load_digits_784(train=False)
    x_train, y_labels = sample_train_subset(
        x_train_full, y_train_full, args.train_size, seed=args.seed
    )
    y_1h = to_one_hot(y_labels, 10)

    kan = FixedKAN(FixedKANConfig(
        network_shape=[meta["image_dim"], 32, 16, 16, 10], max_degree=5,
        complexity_weight=0.001, degree_objective="penalized_mse",
        consistent_tanh=True, lstsq_method="normal",
    ))
    kan.optimize(jnp.asarray(x_train), jnp.asarray(y_1h), seed=args.seed)
    kan.train(
        jnp.asarray(x_train), jnp.asarray(y_labels), epochs=15,
        learning_rate=0.002, trainable="all", lr_scale="fanin",
        grad_clip=1.0, batch_size=64, seed=args.seed,
    )

    from qkan_implementation_tpu.models.fixed_kan import kan_apply

    def acc(x, labels, precision, backend="xla", compute_dtype=None):
        pred = np.asarray(jax.jit(
            lambda p, xb: kan_apply(
                p, xb, kan.config.max_degree, compute_dtype, backend,
                matmul_precision=precision,
            )
        )(kan.params, jnp.asarray(x)))
        return float((pred.argmax(axis=1) == labels).mean())

    rec = {"seed": args.seed, "device": str(jax.devices()[0])}
    # 'fused' = the Pallas VMEM-basis kernel: with the forward policy
    # pinning xla to bf16x3 it is now the FASTER serving path at flagship
    # shape (66.5M vs 55.7M rows/s, serving_latency_tpu.json r4) -- this
    # row checks it is also at full eval accuracy (Mosaic f32 numerics).
    # 'bf16io'/'int8' quantize per product at ~4e-3 -- the SAME order as
    # the single bf16 pass that costs 5.6 points -- so their flagship
    # serving accuracy is measured here instead of assumed from
    # small-shape relative-error checks.
    # r5 additions (VERDICT r4 items 3+4): the accuracy-throughput
    # frontier between the device default (1 bf16 pass) and the policy
    # 'high' (3 passes) -- manual bf16x2 splits of either operand -- plus
    # the two-level residual int8 recipe (3 int8 dots ~ 1.5 bf16-pass
    # MXU equivalents, ~1/254^2 effective resolution,
    # ops.qkan_layer.int8_residual_matmul).
    for name, prec, backend, cd in [
        ("default", None, "xla", None), ("high", "high", "xla", None),
        ("highest", "highest", "xla", None), ("fused", None, "fused", None),
        # fused_dw accuracy rows (r5): 'auto' resolves the same fan-in
        # policy as serving defaults (bf16x3-class in-kernel splits at
        # flagship width); the bf16 row is the kernel's one-pass class
        ("fused_dw", "auto", "fused_dw", None),
        ("fused_dw_bf16", None, "fused_dw", jnp.bfloat16),
        ("bf16x2_w", "bf16x2_w", "xla", None),
        ("bf16x2_x", "bf16x2_x", "xla", None),
        ("bf16io", None, "xla", jnp.bfloat16),
        ("int8", None, "xla", jnp.int8),
        ("int8x2", None, "xla", "int8x2"),
        ("int8x2w", None, "xla", "int8x2w"),
    ]:
        rec[f"train_acc_{name}"] = acc(x_train, y_labels, prec, backend, cd)
        rec[f"test_acc_{name}"] = acc(x_test, y_test, prec, backend, cd)
        print(name, rec[f"train_acc_{name}"], rec[f"test_acc_{name}"],
              flush=True)

    # int8 error decomposition (VERDICT r4 item 4): which operand's
    # quantization kills single-level int8 at flagship fan-in?  Re-run
    # the forward with exactly ONE side quantized (the other f32) --
    # probe-local matmuls, parity-checked against the library forward.
    from qkan_implementation_tpu.ops.chebyshev import chebyshev_basis

    def _quant127(a):
        return jnp.round(a * 127.0) / 127.0

    def _quant_w(W):
        s = jnp.maximum(jnp.max(jnp.abs(W), axis=0, keepdims=True), 1e-30)
        return jnp.round(W / s * 127.0) / 127.0 * s

    def forward_custom(params, x, matmul):
        D = kan.config.max_degree
        cur = x
        for lp in params:
            t = jnp.tanh(cur)
            basis = chebyshev_basis(t, D, clip=False)
            mask = (
                jnp.arange(D + 1)[None, :] <= lp["degrees"][:, None]
            )
            W = jnp.einsum(
                "oidt,od->idt", lp["coefficients"],
                mask.astype(lp["coefficients"].dtype)
                * lp["horizontal_weights"][:, None],
            ).reshape(-1, lp["coefficients"].shape[-1])
            cur = matmul(basis.reshape(x.shape[0], -1), W)
        return cur

    def acc_custom(x, labels, matmul):
        pred = np.asarray(jax.jit(
            lambda p, xb: forward_custom(p, xb, matmul)
        )(kan.params, jnp.asarray(x)))
        return float((pred.argmax(axis=1) == labels).mean())

    f32dot = lambda a, W: jnp.matmul(a, W, precision="highest")
    parity = abs(
        acc_custom(x_test, y_test, f32dot) - rec["test_acc_highest"]
    )
    assert parity < 5e-3, f"probe-local forward drifted: {parity}"
    rec["test_acc_int8_acts_only"] = acc_custom(
        x_test, y_test, lambda a, W: f32dot(_quant127(a), W)
    )
    rec["test_acc_int8_weights_only"] = acc_custom(
        x_test, y_test, lambda a, W: f32dot(a, _quant_w(W))
    )
    print("int8 decomposition: acts-only",
          rec["test_acc_int8_acts_only"], "weights-only",
          rec["test_acc_int8_weights_only"], flush=True)
    rec["train_delta_high_vs_default"] = round(
        rec["train_acc_high"] - rec["train_acc_default"], 4
    )
    rec["test_delta_high_vs_default"] = round(
        rec["test_acc_high"] - rec["test_acc_default"], 4
    )
    out = pathlib.Path(__file__).resolve().parent / "records"
    out.mkdir(parents=True, exist_ok=True)
    plat = jax.devices()[0].platform
    (out / f"eval_precision_probe_{plat}.json").write_text(
        json.dumps(rec, indent=1)
    )
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
