"""Committed evidence for the reference's flagship MNIST workload shape.

The reference's headline experiment is FixedKAN [784, 32, 16, 16, 10],
max_degree 5, 10k train samples on real MNIST, with saved accuracy
artifacts (fixed_kan_tests.py:293-410; accuracies 0.5127/0.2671 at
analyze_model_utils.py:233-241).  Real MNIST is unavailable in this
environment (no network egress), so this runs the SAME workload shape on
``digits-784``: real handwritten-digit scans (sklearn digits) bilinearly
upsampled to 28x28 and shift/noise-augmented to 10k samples -- labeled as
such everywhere, never presented as MNIST (VERDICT r1 provenance item).

Three configurations per run:
  reference-faithful  -- the reference's exact semantics (degenerate
                         degree reward and tanh inconsistency included)
  improved            -- penalized-MSE objective + consistent tanh
  improved+train      -- plus full-gradient refinement epochs

Artifacts -> benchmarks/records/mnist_shape_{config}.json (+ 64-dim digits
baseline rows for the quality table).

Run: PYTHONPATH=. python benchmarks/mnist_shape_evidence.py           (TPU)
     PYTHONPATH=. QKAN_PLATFORM=cpu python benchmarks/mnist_shape_evidence.py --quick
"""

from qkan_implementation_tpu.utils.platform import apply_platform_env

apply_platform_env()

import argparse
import json
import pathlib

import jax

from qkan_implementation_tpu.experiments.mnist import run_mnist_experiment


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="tiny CPU smoke")
    ap.add_argument("--train-size", type=int, default=10000)
    ap.add_argument(
        "--only",
        default=None,
        help="run a single flagship config by name (skips the digits-64 "
        "and shallow rows) -- e.g. improved_trained_fused_bf16",
    )
    ap.add_argument(
        "--nruns",
        type=int,
        default=1,
        help="with --only: run N sampling seeds through the statistical "
        "harness and write a *_nruns.json record (mean/std/min/max)",
    )
    ap.add_argument(
        "--ensemble",
        action="store_true",
        help="with --nruns: also evaluate the N seed-varied models as one "
        "soft-voting ensemble (adds ensemble_test_accuracy to the record)",
    )
    args = ap.parse_args()

    train_size = 500 if args.quick else args.train_size
    shape = [784, 16, 10] if args.quick else [784, 32, 16, 16, 10]
    num_reads = 64 if args.quick else 1000
    epochs = 2 if args.quick else 15

    configs = {
        # the reference's exact config incl. complexity_weight=0.1
        # (fixed_kan_tests.py:297-303) -- its degree reward is degenerate,
        # so ~chance accuracy is the faithful outcome
        "reference_faithful": dict(
            degree_objective="reference", consistent_tanh=False,
            complexity_weight=0.1, weight_epochs=0,
        ),
        "improved": dict(
            degree_objective="penalized_mse", consistent_tanh=True,
            complexity_weight=0.001, weight_epochs=0,
        ),
        # fan-in-scaled per-layer Adam lr: without it the wide first
        # layer's outputs drift past tanh saturation and the stack
        # collapses (see FixedKAN.train docstring)
        "improved_trained": dict(
            degree_objective="penalized_mse", consistent_tanh=True,
            complexity_weight=0.001, weight_epochs=epochs,
            weight_trainable="all", weight_lr_scale="fanin",
            weight_grad_clip=1.0, learning_rate=0.002,
        ),
        # accuracy-parity evidence for the Pallas fused + bf16-stored-x
        # training recipe (the 11x train-step kernel): same run as
        # improved_trained, gradients through ops/fused_layer.py in bf16
        "improved_trained_fused_bf16": dict(
            degree_objective="penalized_mse", consistent_tanh=True,
            complexity_weight=0.001, weight_epochs=epochs,
            weight_trainable="all", weight_lr_scale="fanin",
            weight_grad_clip=1.0, learning_rate=0.002,
            weight_backend="fused", weight_compute_dtype="bfloat16",
        ),
        # the other two cells of the {backend} x {dtype} square, for
        # attributing any fused_bf16 quality gap to the Mosaic lowering
        # (fused+f32 fails too) vs bf16 training dynamics (xla+bf16
        # fails too) -- chip-gated diagnosis, docs/benchmarks.md
        "improved_trained_fused": dict(
            degree_objective="penalized_mse", consistent_tanh=True,
            complexity_weight=0.001, weight_epochs=epochs,
            weight_trainable="all", weight_lr_scale="fanin",
            weight_grad_clip=1.0, learning_rate=0.002,
            weight_backend="fused",
        ),
        # r5 degree-wise kernel cells: end-to-end trained accuracy for
        # backend='fused_dw' in both precision classes (the kernel wins
        # the whole-model train step in both, flagship_train_step.json --
        # these rows prove its custom VJP also trains to the band)
        "improved_trained_fused_dw": dict(
            degree_objective="penalized_mse", consistent_tanh=True,
            complexity_weight=0.001, weight_epochs=epochs,
            weight_trainable="all", weight_lr_scale="fanin",
            weight_grad_clip=1.0, learning_rate=0.002,
            weight_backend="fused_dw",
        ),
        "improved_trained_fused_dw_bf16": dict(
            degree_objective="penalized_mse", consistent_tanh=True,
            complexity_weight=0.001, weight_epochs=epochs,
            weight_trainable="all", weight_lr_scale="fanin",
            weight_grad_clip=1.0, learning_rate=0.002,
            weight_backend="fused_dw", weight_compute_dtype="bfloat16",
        ),
        "improved_trained_bf16": dict(
            degree_objective="penalized_mse", consistent_tanh=True,
            complexity_weight=0.001, weight_epochs=epochs,
            weight_trainable="all", weight_lr_scale="fanin",
            weight_grad_clip=1.0, learning_rate=0.002,
            weight_compute_dtype="bfloat16",
        ),
        # TPU-gap diagnosis cell (r4): same recipe as improved_trained but
        # every training matmul runs precision 'high' (bf16x3 passes, ~f32
        # products).  On-chip xla/f32 measured 0.803 vs the CPU true-f32 band
        # 0.878+-0.013 with identical config/seed -- if this cell recovers
        # the band, the gap is the TPU f32 default's single bf16 pass in
        # the gradient path (the training analog of the r3 Gram finding)
        "improved_trained_prec3x": dict(
            degree_objective="penalized_mse", consistent_tanh=True,
            complexity_weight=0.001, weight_epochs=epochs,
            weight_trainable="all", weight_lr_scale="fanin",
            weight_grad_clip=1.0, learning_rate=0.002,
            weight_matmul_precision="high",
        ),
        # the measured capability ceiling: doubling epochs WITH the cosine
        # schedule (constant-lr 30ep overfits: 0.881) -- 0.900 single-seed
        # CPU on the QR structure path
        "improved_trained_cosine30": dict(
            degree_objective="penalized_mse", consistent_tanh=True,
            complexity_weight=0.001, weight_epochs=2 * epochs,
            weight_trainable="all", weight_lr_scale="fanin",
            weight_grad_clip=1.0, learning_rate=0.002,
            weight_lr_schedule="cosine",
        ),
        # practical-ceiling recipe: the cosine30 schedule at max_degree 7
        # (richer per-edge basis; single-seed probe measured 0.9028 vs
        # 0.900 at the reference's degree 5)
        "improved_trained_cosine30_deg7": dict(
            degree_objective="penalized_mse", consistent_tanh=True,
            complexity_weight=0.001, weight_epochs=2 * epochs,
            weight_trainable="all", weight_lr_scale="fanin",
            weight_grad_clip=1.0, learning_rate=0.002,
            weight_lr_schedule="cosine", max_degree=7,
        ),
        # the ceiling recipe with precision-pinned training matmuls: the
        # TPU quality headline once the prec3x diagnosis confirms (CPU band
        # for the unpinned recipe: 0.887 +- 0.010, max 0.903)
        "improved_trained_cosine30_deg7_prec": dict(
            degree_objective="penalized_mse", consistent_tanh=True,
            complexity_weight=0.001, weight_epochs=2 * epochs,
            weight_trainable="all", weight_lr_scale="fanin",
            weight_grad_clip=1.0, learning_rate=0.002,
            weight_lr_schedule="cosine", max_degree=7,
            weight_matmul_precision="high",
        ),
    }

    out = pathlib.Path(__file__).resolve().parent / "records"
    out.mkdir(parents=True, exist_ok=True)
    # quick smoke runs must never clobber the committed TPU records
    pre = "QUICK_" if args.quick else ""
    if args.only is not None:
        if args.only not in configs:
            raise SystemExit(
                f"unknown config {args.only!r}; choose from {sorted(configs)}"
            )
        configs = {args.only: configs[args.only]}
    note = (
        "dataset is digits-784 (upsampled+augmented sklearn digits), "
        "NOT MNIST; reference MNIST baselines 0.5127/0.2671 are not "
        "directly comparable"
    )
    for name, overrides in configs.items():
        print(f"=== {name} ===")
        common = dict(
            network_shape=shape,
            max_degree=5,
            train_size=train_size,
            dataset="digits-784",
            lstsq_method="normal",
            num_reads=num_reads,
        )
        common.update(overrides)  # configs may override max_degree etc.
        if args.nruns > 1:
            from qkan_implementation_tpu.experiments.mnist import (
                run_mnist_n_times,
            )

            res = run_mnist_n_times(
                n=args.nruns, verbose=True, ensemble=args.ensemble,
                **common,
            )
            res.pop("distributions", None)
            for r in res["runs"]:
                r["device"] = str(jax.devices()[0])
                r["config_name"] = name
            res["note"] = note
            plat = "cpu" if jax.devices()[0].platform == "cpu" else "tpu"
            (
                out / f"{pre}mnist_shape_{name}_{plat}_nruns.json"
            ).write_text(json.dumps(res, indent=1))
            print(
                f"{name}: {res['test_accuracy_mean']:.4f} "
                f"+- {res['test_accuracy_std']:.4f} "
                f"(min {res['test_accuracy_min']:.4f}, "
                f"max {res['test_accuracy_max']:.4f})"
            )
            if args.ensemble:
                print(
                    f"{name}: soft-voting ensemble of {args.nruns} = "
                    f"{res['ensemble_test_accuracy']:.4f}"
                )
            continue
        res = run_mnist_experiment(verbose=True, **common)
        res.pop("_model", None)
        res["config_name"] = name
        res["device"] = str(jax.devices()[0])
        res["note"] = note
        (out / f"{pre}mnist_shape_{name}.json").write_text(
            json.dumps(res, indent=1)
        )

    if args.only is not None:
        print(f"records -> {out}")
        return

    # 64-dim digits quality rows (no upsampling) for the quality table
    for name, overrides in configs.items():
        print(f"=== digits-64 {name} ===")
        res = run_mnist_experiment(
            network_shape=None,  # -> [64, 32, 16, 16, 10]
            max_degree=5,
            train_size=train_size,
            dataset="auto",
            lstsq_method="normal",
            num_reads=num_reads,
            verbose=True,
            **overrides,
        )
        res.pop("_model", None)
        res["config_name"] = name
        res["device"] = str(jax.devices()[0])
        (out / f"{pre}digits64_{name}.json").write_text(json.dumps(res, indent=1))

    # shallow-shape quality rows: the deep reference architecture (every
    # layer greedily fit to the same y) caps accuracy; a [in, 16, 10]
    # stack shows what the optimizer+trainer reach when the architecture
    # is not the bottleneck
    for tag, ds, shp in (
        ("digits784_shallow", "digits-784", [784, 16, 10]),
        ("digits64_shallow", "auto", [64, 16, 10]),
    ):
        print(f"=== {tag} improved_trained ===")
        res = run_mnist_experiment(
            network_shape=shp,
            max_degree=5,
            train_size=train_size,
            dataset=ds,
            lstsq_method="normal",
            num_reads=num_reads,
            verbose=True,
            **configs["improved_trained"],
        )
        res.pop("_model", None)
        res["config_name"] = "improved_trained_shallow"
        res["device"] = str(jax.devices()[0])
        (out / f"{pre}{tag}_improved_trained.json").write_text(
            json.dumps(res, indent=1)
        )
    print(f"records -> {out}")


if __name__ == "__main__":
    main()
