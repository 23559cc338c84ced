"""Pallas-fused batched QKAN layer: forward + VJP contracts vs the XLA path.

The fused kernels (experimental/pallas_layer.py) must be bit-honest substitutes for
``qkan_layer_forward_batched`` (reference semantics
``QKAN_Steps_original/QKANLayer.py:77-135``) under interpret mode on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qkan_implementation_tpu.experimental.pallas_layer import (
    qkan_layer_fused,
    qkan_layer_fused_dw,
    qkan_layer_forward_batched_fused,
    weights_to_m3,
)
from qkan_implementation_tpu.ops.qkan_layer import qkan_layer_forward_batched


def _setup(B=64, N=4, K=3, deg=5, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-1, 1, (B, N)), dtype=dtype)
    w = jnp.asarray(rng.standard_normal((deg + 1, N * K)) * 0.3, dtype=dtype)
    return x, w, N, K


def test_fused_forward_matches_batched():
    x, w, N, K = _setup()
    ref = qkan_layer_forward_batched(x, w, N, K)
    out = qkan_layer_forward_batched_fused(x, w, N, K, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_vjp_matches_xla_grads():
    # Grads are compared in the SAME parameterization (x, w): weights_to_m3
    # is a differentiable linear map (it absorbs qkan_weight_tensor's
    # 1/(N(D+1)) normalization and Fortran-order gather), so chaining the
    # fused layer's custom VJP through it must reproduce the XLA path's
    # gradients exactly.
    x, w, N, K = _setup(B=32, deg=4)

    def loss_fused(x, w):
        return jnp.sum(
            qkan_layer_fused(x, weights_to_m3(w, N, K), True) ** 2
        )

    def loss_ref(x, w):
        return jnp.sum(qkan_layer_forward_batched(x, w, N, K) ** 2)

    np.testing.assert_allclose(
        float(loss_fused(x, w)), float(loss_ref(x, w)), rtol=1e-6
    )
    gx1, gw1 = jax.grad(loss_fused, argnums=(0, 1))(x, w)
    gx2, gw2 = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), atol=1e-4)


def test_dw_only_backward_matches_full_dm_and_zero_dx():
    x, w, N, K = _setup(B=48, deg=6, seed=3)
    m3 = weights_to_m3(w, N, K)

    def loss_full(x, m3):
        return jnp.sum(qkan_layer_fused(x, m3, True) ** 2)

    def loss_dw(x, m3):
        return jnp.sum(qkan_layer_fused_dw(x, m3, True) ** 2)

    # forwards identical
    np.testing.assert_allclose(
        np.asarray(qkan_layer_fused_dw(x, m3, True)),
        np.asarray(qkan_layer_fused(x, m3, True)),
        atol=0,
    )
    gx_full, gm_full = jax.grad(loss_full, argnums=(0, 1))(x, m3)
    gx_dw, gm_dw = jax.grad(loss_dw, argnums=(0, 1))(x, m3)
    np.testing.assert_allclose(
        np.asarray(gm_dw), np.asarray(gm_full), atol=1e-5
    )
    assert np.all(np.asarray(gx_dw) == 0.0)
    assert np.any(np.asarray(gx_full) != 0.0)


def test_fused_padding_path():
    # batch not a multiple of TILE_B exercises the pad/unpad epilogue
    x, w, N, K = _setup(B=100, N=3, K=2, deg=3, seed=5)
    ref = qkan_layer_forward_batched(x, w, N, K)
    out = qkan_layer_forward_batched_fused(x, w, N, K, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
