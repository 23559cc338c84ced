"""Pallas-fused FixedKAN layer (ops/fused_layer.py) vs the XLA path.

Runs in interpret mode on the CPU suite (kan_layer_apply selects it off
the platform); on TPU the same code compiles to a real kernel -- the
flagship train-step benchmark A/Bs it there.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qkan_implementation_tpu.models.fixed_kan import (
    kan_apply,
    kan_layer_apply,
)
from qkan_implementation_tpu.ops.fused_layer import kan_layer_fused


def random_layer(rng, in_dim, out, T, D, ragged=True):
    degs = (
        rng.integers(0, D + 1, out) if ragged else np.full(out, D)
    ).astype(np.int32)
    return {
        "degrees": jnp.asarray(degs),
        "coefficients": jnp.asarray(
            rng.normal(0, 0.3, (out, in_dim, D + 1, T)).astype(np.float64)
        ),
        "horizontal_weights": jnp.asarray(
            rng.normal(0, 1, out).astype(np.float64)
        ),
    }


def test_fused_forward_matches_xla_backend():
    rng = np.random.default_rng(0)
    D = 5
    lp = random_layer(rng, 23, 7, 4, D)
    x = jnp.asarray(rng.uniform(-2, 2, (37, 23)))  # non-tile-multiple batch
    want = np.asarray(kan_layer_apply(lp, x, D, backend="xla"))
    got = np.asarray(kan_layer_apply(lp, x, D, backend="fused"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fused_gradients_match_xla_backend():
    rng = np.random.default_rng(1)
    D = 4
    lp = random_layer(rng, 11, 5, 3, D)
    x = jnp.asarray(rng.uniform(-1.5, 1.5, (19, 11)))
    y = jnp.asarray(rng.normal(0, 1, (19, 3)))

    degs = lp["degrees"]

    def loss(tp, x, backend):
        out = kan_layer_apply(dict(tp, degrees=degs), x, D, backend=backend)
        return jnp.mean((out - y) ** 2)

    tp = {k: v for k, v in lp.items() if k != "degrees"}
    (gp_x, gx_x) = jax.grad(loss, argnums=(0, 1))(tp, x, "xla")
    (gp_f, gx_f) = jax.grad(loss, argnums=(0, 1))(tp, x, "fused")
    np.testing.assert_allclose(
        np.asarray(gx_f), np.asarray(gx_x), rtol=1e-4, atol=1e-6
    )
    for k in ("coefficients", "horizontal_weights"):
        np.testing.assert_allclose(
            np.asarray(gp_f[k]),
            np.asarray(gp_x[k]),
            rtol=1e-4,
            atol=1e-6,
            err_msg=k,
        )


def test_fused_multi_layer_and_jit():
    rng = np.random.default_rng(2)
    D = 3
    params = [
        random_layer(rng, 6, 4, 5, D),
        random_layer(rng, 5, 3, 2, D),
    ]
    x = jnp.asarray(rng.uniform(-1, 1, (16, 6)))
    want = np.asarray(kan_apply(params, x, D))
    got = np.asarray(
        jax.jit(lambda p, x: kan_apply(p, x, D, backend="fused"))(params, x)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fused_bf16_compute_dtype():
    rng = np.random.default_rng(3)
    D = 5
    lp = random_layer(rng, 32, 4, 3, D, ragged=False)
    x = jnp.asarray(rng.uniform(-1, 1, (24, 32)).astype(np.float32))
    exact = np.asarray(kan_layer_apply(lp, x, D))
    got = kan_layer_apply(lp, x, D, jnp.bfloat16, backend="fused")
    assert got.dtype == jnp.float32
    scale = np.std(exact) + 1e-9
    assert np.max(np.abs(np.asarray(got) - exact)) < 0.1 * max(scale, 1.0)


def test_fused_rejects_int8():
    rng = np.random.default_rng(4)
    lp = random_layer(rng, 4, 2, 2, 2)
    x = jnp.asarray(rng.uniform(-1, 1, (8, 4)))
    with pytest.raises(ValueError, match="int8"):
        kan_layer_apply(lp, x, 2, jnp.int8, backend="fused")


def test_fused_raw_op_degree_major_contract():
    """kan_layer_fused consumes DEGREE-MAJOR w2[d*in + i, t]."""
    rng = np.random.default_rng(5)
    in_dim, T, dp1 = 9, 2, 4
    w_dm = jnp.asarray(rng.normal(0, 1, (dp1 * in_dim, T)))
    x = jnp.asarray(rng.uniform(-2, 2, (13, in_dim)))
    got = np.asarray(kan_layer_fused(x, w_dm, dp1, True))
    t = np.tanh(np.asarray(x))
    ts = [np.ones_like(t), t]
    for _ in range(2, dp1):
        ts.append(2.0 * t * ts[-1] - ts[-2])
    basis = np.concatenate(ts[:dp1], axis=1)
    want = basis @ np.asarray(w_dm)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)


def test_fused_raw_chebyshev_mode_matches_qkan_layer():
    """apply_tanh=False runs the recurrence on raw x: forward AND both
    cotangents must match qkan_layer_forward_batched (the QKANLayer
    semantics, tanh upstream) under the degree-major weight fold -- the
    contract the r4 K=128 MFU shootout relies on."""
    from qkan_implementation_tpu.ops.qkan_layer import (
        qkan_layer_forward_batched,
        qkan_weight_tensor,
    )

    rng = np.random.default_rng(7)
    N, K, D = 16, 8, 7
    x = jnp.asarray(rng.uniform(-1, 1, (37, N)), dtype=jnp.float32)
    w = jnp.asarray(rng.uniform(-1, 1, (D + 1, N * K)), dtype=jnp.float32)

    def ref(x, w):
        return qkan_layer_forward_batched(x, w, N, K)

    def fused(x, w):
        M = qkan_weight_tensor(w, N, K)
        w2 = M.transpose(2, 1, 0).reshape(-1, K)
        return kan_layer_fused(x, w2, D + 1, True, False)  # interpret, no tanh

    np.testing.assert_allclose(
        np.asarray(fused(x, w)), np.asarray(ref(x, w)), rtol=1e-5, atol=1e-5
    )

    def loss(fn):
        def f(x, w):
            return jnp.sum(jnp.sin(fn(x, w)))
        return jax.grad(f, argnums=(0, 1))

    dx_r, dw_r = loss(ref)(x, w)
    dx_f, dw_f = loss(fused)(x, w)
    np.testing.assert_allclose(np.asarray(dx_f), np.asarray(dx_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw_f), np.asarray(dw_r), rtol=1e-4, atol=1e-5)


def test_fused_tanh_mode_unchanged_by_flag_default():
    """The apply_tanh flag must default to the original tanh semantics."""
    rng = np.random.default_rng(8)
    in_dim, T, dp1 = 5, 3, 4
    w_dm = jnp.asarray(rng.normal(0, 1, (dp1 * in_dim, T)))
    x = jnp.asarray(rng.uniform(-2, 2, (9, in_dim)))
    np.testing.assert_array_equal(
        np.asarray(kan_layer_fused(x, w_dm, dp1, True)),
        np.asarray(kan_layer_fused(x, w_dm, dp1, True, True)),
    )


def test_fused_train_step_matches_jax_grad():
    """kan_train_step_fused: one-kernel fwd+loss+dW must equal jax.grad
    of the plain XLA forward for both losses, honor apply_tanh/tile_b,
    and reject non-multiple batches (padding would bias 'mse')."""
    from qkan_implementation_tpu.ops.chebyshev import chebyshev_basis
    from qkan_implementation_tpu.ops.fused_layer import kan_train_step_fused

    rng = np.random.default_rng(5)
    B, n, dp1, T = 512, 16, 8, 16
    x = jnp.asarray(rng.uniform(-1, 1, (B, n)), dtype=jnp.float32)
    w2 = jnp.asarray(rng.uniform(-1, 1, (dp1 * n, T)), dtype=jnp.float32)
    y = jnp.asarray(rng.normal(0, 1, (B, T)), dtype=jnp.float32)

    def fwd(w, tanh):
        t = jnp.tanh(x) if tanh else x
        bas = chebyshev_basis(t, dp1 - 1, clip=False)
        return bas.transpose(0, 2, 1).reshape(B, -1) @ w

    for loss_name, tanh, lf in [
        ("sumsq", True, lambda w: jnp.sum(fwd(w, True) ** 2)),
        ("mse", True, lambda w: jnp.mean((fwd(w, True) - y) ** 2)),
        ("sumsq", False, lambda w: jnp.sum(fwd(w, False) ** 2)),
    ]:
        ref_l, ref_dw = lf(w2), jax.grad(lf)(w2)
        got_l, got_dw = kan_train_step_fused(
            x, w2, dp1, y=(y if loss_name == "mse" else None),
            loss=loss_name, interpret=True, apply_tanh=tanh, tile_b=128,
        )
        np.testing.assert_allclose(
            float(got_l), float(ref_l), rtol=1e-5
        )
        rel = float(
            jnp.linalg.norm(got_dw - ref_dw) / jnp.linalg.norm(ref_dw)
        )
        assert rel < 1e-5, (loss_name, tanh, rel)

    with pytest.raises(ValueError, match="multiple of the tile"):
        kan_train_step_fused(x[:300], w2, dp1, interpret=True, tile_b=256)
    with pytest.raises(ValueError, match="needs targets"):
        kan_train_step_fused(x, w2, dp1, loss="mse", interpret=True)
    with pytest.raises(ValueError, match="unknown loss"):
        kan_train_step_fused(x, w2, dp1, loss="mae", interpret=True)
    with pytest.raises(ValueError, match="unknown fused precision"):
        kan_train_step_fused(x, w2, dp1, interpret=True, precision="x9")


def test_fused_layer_precision_and_tile_knobs():
    """precision='default'/tile_b overrides keep forward+grad parity in
    interpret mode (where both resolve to exact host dots)."""
    rng = np.random.default_rng(6)
    B, n, dp1, T = 300, 8, 4, 8  # non-multiple batch exercises padding
    x = jnp.asarray(rng.uniform(-1, 1, (B, n)), dtype=jnp.float32)
    w2 = jnp.asarray(rng.uniform(-1, 1, (dp1 * n, T)), dtype=jnp.float32)
    base = kan_layer_fused(x, w2, dp1, True, True)
    alt = kan_layer_fused(x, w2, dp1, True, True, "default", 64)
    np.testing.assert_allclose(np.asarray(base), np.asarray(alt), rtol=1e-6)
    g1 = jax.grad(
        lambda w: jnp.sum(kan_layer_fused(x, w, dp1, True, True) ** 2)
    )(w2)
    g2 = jax.grad(
        lambda w: jnp.sum(
            kan_layer_fused(x, w, dp1, True, True, "default", 64) ** 2
        )
    )(w2)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5)


def test_degreewise_kernel_matches_v1_and_xla():
    """v2 degree-wise schedule: same contract as kan_layer_fused (fwd +
    custom VJP) without materializing the basis -- parity across
    precisions, apply_tanh modes, dp1=1 edge, and non-tile batches."""
    from qkan_implementation_tpu.ops.chebyshev import chebyshev_basis
    from qkan_implementation_tpu.ops.fused_layer import kan_layer_fused_dw

    rng = np.random.default_rng(5)
    for (B, n, dp1, T, tanh) in [
        (96, 24, 6, 32, True),
        (64, 16, 8, 16, False),
        (40, 8, 1, 4, True),
        (33, 5, 2, 3, True),  # non-multiple batch exercises padding
    ]:
        lo, hi = (-2, 2) if tanh else (-0.95, 0.95)
        x = jnp.asarray(
            rng.uniform(lo, hi, (B, n)).astype(np.float32)
        )
        w2 = jnp.asarray(
            rng.normal(0, 0.5, (dp1 * n, T)).astype(np.float32)
        )

        def ref_fn(x, w2):
            t = jnp.tanh(x) if tanh else x
            bas = chebyshev_basis(t, dp1 - 1, clip=False)
            return bas.transpose(0, 2, 1).reshape(B, -1) @ w2

        for prec in ("high", "default", "bf16"):
            out = kan_layer_fused_dw(x, w2, dp1, True, tanh, prec)
            ref = ref_fn(x, w2)
            tol, gtol = (1e-4, 1e-3) if prec != "bf16" else (0.15, 1.0)
            assert float(jnp.max(jnp.abs(out - ref))) < tol

            g_ref = jax.grad(
                lambda x, w: jnp.sum(jnp.sin(ref_fn(x, w))),
                argnums=(0, 1),
            )(x, w2)
            g_dw = jax.grad(
                lambda x, w: jnp.sum(
                    jnp.sin(kan_layer_fused_dw(x, w, dp1, True, tanh, prec))
                ),
                argnums=(0, 1),
            )(x, w2)
            for a, b in zip(g_ref, g_dw):
                assert float(jnp.max(jnp.abs(a - b))) < gtol


def test_degreewise_rejects_unknown_precision():
    from qkan_implementation_tpu.ops.fused_layer import kan_layer_fused_dw

    x = jnp.zeros((8, 4), jnp.float32)
    w2 = jnp.zeros((8, 2), jnp.float32)
    with pytest.raises(ValueError, match="precision"):
        kan_layer_fused_dw(x, w2, 2, True, True, "bf32")


def test_fused_dw_backend_matches_xla_backend():
    """backend='fused_dw' through kan_layer_apply/kan_apply: forward and
    gradient parity with the xla backend, plus the bf16 compute_dtype
    class staying in f32-output contract."""
    rng = np.random.default_rng(9)
    D = 5
    lp = random_layer(rng, 23, 7, 4, D)
    x = jnp.asarray(rng.uniform(-2, 2, (37, 23)))
    want = np.asarray(kan_layer_apply(lp, x, D, backend="xla"))
    got = np.asarray(kan_layer_apply(lp, x, D, backend="fused_dw"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    out_bf16 = kan_layer_apply(
        lp, x, D, backend="fused_dw", compute_dtype=jnp.bfloat16
    )
    assert out_bf16.dtype == jnp.float32
    assert (
        float(jnp.max(jnp.abs(out_bf16 - want)))
        < 0.1 * float(jnp.max(jnp.abs(want))) + 0.05
    )

    degs = lp["degrees"]
    y = jnp.asarray(rng.normal(0, 1, (37, 4)))

    def loss(tp, x, backend):
        out = kan_layer_apply(dict(tp, degrees=degs), x, D, backend=backend)
        return jnp.mean((out - y) ** 2)

    tp = {k: v for k, v in lp.items() if k != "degrees"}
    gp_x, gx_x = jax.grad(loss, argnums=(0, 1))(tp, x, "xla")
    gp_f, gx_f = jax.grad(loss, argnums=(0, 1))(tp, x, "fused_dw")
    np.testing.assert_allclose(
        np.asarray(gx_f), np.asarray(gx_x), rtol=1e-4, atol=1e-5
    )
    for k in gp_x:
        np.testing.assert_allclose(
            np.asarray(gp_f[k]), np.asarray(gp_x[k]), rtol=1e-4, atol=1e-5
        )


def test_fused_dw_rejects_int8():
    rng = np.random.default_rng(2)
    lp = random_layer(rng, 6, 3, 2, 3)
    x = jnp.asarray(rng.uniform(-1, 1, (8, 6)))
    with pytest.raises(ValueError, match="int8"):
        kan_layer_apply(lp, x, 3, backend="fused_dw", compute_dtype="int8x2")


def test_fused_dw_maps_xla_precision_names():
    """A config tuned on the xla backend (matmul_precision 'highest' /
    'bf16x2_w' / 'bf16x2_x') must run on backend='fused_dw' by mapping to
    the kernel's nearest mode ('high', its accuracy ceiling) instead of
    crashing in the kernel's mode check."""
    rng = np.random.default_rng(4)
    D = 4
    lp = random_layer(rng, 12, 5, 3, D)
    x = jnp.asarray(rng.uniform(-2, 2, (16, 12)))
    want = np.asarray(kan_layer_apply(lp, x, D, backend="xla"))
    for prec in ("highest", "bf16x2_w", "bf16x2_x", "high", "auto", None):
        got = np.asarray(
            kan_layer_apply(
                lp, x, D, backend="fused_dw", matmul_precision=prec
            )
        )
        # interpret mode runs true-f32 dots in every mapped mode
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_dw_bf16_class_feeds_bf16_input():
    """compute_dtype=bfloat16 on fused_dw streams x to the kernel AT bf16
    (the bf16io recipe: tanh + recurrence in bf16, f32 accumulation) --
    the dispatch must not silently upcast the input back to f32."""
    from unittest import mock

    rng = np.random.default_rng(11)
    D = 3
    lp = random_layer(rng, 6, 4, 2, D)
    x = jnp.asarray(rng.uniform(-1, 1, (8, 6)))
    seen = {}
    from qkan_implementation_tpu.ops import fused_layer

    orig = fused_layer.kan_layer_fused_dw

    def spy(xin, *a, **k):
        seen["dtype"] = xin.dtype
        return orig(xin, *a, **k)

    with mock.patch.object(fused_layer, "kan_layer_fused_dw", spy):
        kan_layer_apply(
            lp, x, D, backend="fused_dw", compute_dtype=jnp.bfloat16
        )
    assert seen["dtype"] == jnp.bfloat16
    seen.clear()
    with mock.patch.object(fused_layer, "kan_layer_fused_dw", spy):
        kan_layer_apply(lp, x, D, backend="fused_dw")
    assert seen["dtype"] == jnp.float32
