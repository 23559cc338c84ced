"""Pallas-fused FixedKAN layer: tanh -> Chebyshev basis -> matmul in VMEM.

Why this exists (measured, v5e, 2026-08-17): after the o-collapse the
FixedKAN layer is one ``[B, in*(D+1)] @ [in*(D+1), T]`` matmul, and the
honest train-step bench (rotating batches -- no loop-invariant hoisting)
shows XLA MATERIALIZES the basis tensor to HBM between the elementwise
recurrence and the dot: at the flagship shape ([784,32,16,16,10], B=8192)
the [8192, 4704] f32 basis is 154 MB, ~6x the input batch, and the f32
step reads/writes it several times (1.05 ms/step, flagship_train_step.json
honest revision).  These kernels build the basis tile-by-tile in VMEM so
HBM traffic is x + dout + the small W/dW tensors only.

This is the opposite regime from ``experimental/pallas_layer.py`` (the
recorded NEGATIVE result): there N=16 made the basis 8 KB/tile and XLA
kept it in registers on its own.  At in=784 the basis is ~100x larger and
XLA demonstrably spills it.

Layout contract: ``w2`` is DEGREE-MAJOR, ``w2[d*in + i, t]`` -- the fold
of per-output coefficients/degree-mask/horizontal weights is done by the
caller in plain jnp (batch-independent, tiny).  The in-kernel basis
concatenates the per-degree tiles along features, matching that layout.

Gradient math (custom VJP; t = tanh(x)):
    out[b, t]   = sum_{d,i} T_d(t[b,i]) w2[d*in+i, t]
    dW[d*in+i, t] = sum_b T_d(t[b,i]) g[b, t]        (one [F, TB]@[TB, T])
    dx[b, i]    = (1 - t^2) * sum_d T'_d(t) (g @ W_d^T)[b, i],
                  T'_d = d * U_{d-1}  (Chebyshev 2nd kind)

Reference semantics: KANLayer.forward / KANNeuron.forward
(KAN_w_cumulative_polynomials.py:180-188, :72-82) -- identical math to
``models.fixed_kan.kan_layer_apply``, reassociation-level differences only
(pinned by tests/test_fused_layer.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Batch rows per grid step.  VMEM at TILE_B=256, in=784, D+1=6, f32:
# basis 4.8 MB + x/dx 0.8 MB each + W/dW 0.2 MB each -- comfortably under
# the ~16 MB budget for fwd and bwd alike.
TILE_B = 256


def _dot_x3(a, b, split: bool):
    """~f32-accurate dot for f32 operands on an MXU that multiplies bf16.

    When ``split`` (the compiled-TPU path), f32 operands are decomposed
    into hi (bf16) + lo (bf16 of the residual) and the three significant
    cross terms accumulate in f32 -- the bf16_3x algorithm XLA uses for
    ``precision='high'``, done MANUALLY because this Mosaic version
    rejects precision hints on in-kernel dots ("Bad lhs type", r4).
    Without it the kernel's "f32" dot runs ONE bf16 pass and the fused
    serving forward measured identical accuracy to the single-pass XLA
    default (test 0.756 vs 0.878 on the same parameters,
    eval_precision_probe_tpu.json).  bf16 operands pass through as one
    native dot (they carry no lo part); the lo@lo term is below f32
    rounding and skipped.  Interpret mode (CPU suite, possibly x64) sets
    ``split=False``: the host multiplies exactly at the input dtype.
    """
    if (
        not split
        or a.dtype != jnp.float32
        or b.dtype != jnp.float32
    ):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    d = partial(jnp.dot, preferred_element_type=jnp.float32)
    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def _cheb_blocks(t, dp1):
    """[T_0 | T_1 | ... | T_D](t) of a [TB, in] tile, degree-major list."""
    ts = [jnp.ones_like(t), t]
    for _ in range(2, dp1):
        ts.append(2.0 * t * ts[-1] - ts[-2])
    return ts[:dp1]


def _fwd_kernel(dp1, apply_tanh, split, x_ref, w_ref, out_ref):
    t = jnp.tanh(x_ref[:]) if apply_tanh else x_ref[:]
    basis = jnp.concatenate(_cheb_blocks(t, dp1), axis=1)  # [TB, dp1*in]
    # w2 stays f32 in HBM (it is tiny); for a bf16 x the dot rides the
    # native-bf16 MXU path (one pass, f32 accumulation); for f32 the
    # _dot_x3 split buys ~f32-accurate products (see its docstring)
    out_ref[:] = _dot_x3(basis, w_ref[:].astype(basis.dtype), split).astype(
        out_ref.dtype
    )


def _bwd_kernel(dp1, apply_tanh, split, x_ref, w_ref, g_ref, dx_ref, dw_ref):
    t = jnp.tanh(x_ref[:]) if apply_tanh else x_ref[:]
    g = g_ref[:]
    n = t.shape[1]
    basis = jnp.concatenate(_cheb_blocks(t, dp1), axis=1)

    # dW accumulates across the sequential TPU grid: zero on first visit
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    # dW dot is tiny ([F, TB] @ [TB, T]); f32 INPUTS alone don't buy f32
    # MULTIPLIES on the MXU (the device default is one bf16 pass -- the
    # r4 finding), so the accumulated weight cotangent goes through the
    # _dot_x3 split when the basis is f32
    dw_ref[:] += _dot_x3(basis.astype(jnp.float32).T, g, split).astype(
        dw_ref.dtype
    )

    # dx: d(out)/d(t) via T'_d = d * U_{d-1}, then the tanh chain rule.
    # U recurrence: U_0 = 1, U_1 = 2t, U_d = 2t U_{d-1} - U_{d-2}.
    us = [jnp.ones_like(t), 2.0 * t]
    for _ in range(3, dp1):
        us.append(2.0 * t * us[-1] - us[-2])
    dt = jnp.zeros(t.shape, dtype=jnp.float32)
    for d in range(1, dp1):
        gm_d = _dot_x3(g, w_ref[d * n : (d + 1) * n, :].T, split)
        dt += (float(d) * us[d - 1]) * gm_d
    # tanh chain rule only when the kernel applied tanh; raw-basis mode
    # (apply_tanh=False, the QKANLayer semantics) backprops dt directly
    dx_ref[:] = (((1.0 - t * t) * dt) if apply_tanh else dt).astype(
        dx_ref.dtype
    )


def _batch_tile(b: int) -> int:
    if b >= TILE_B:
        return TILE_B
    return max(8, -(-b // 8) * 8)


def _pad_batch(x, tile):
    b = x.shape[0]
    pad = (-b) % tile
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)])
    return x, b


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def kan_layer_fused(
    x: jax.Array, w2: jax.Array, dp1: int, interpret: bool = False,
    apply_tanh: bool = True,
):
    """Fused layer: [B, in] x degree-major [dp1*in, T] -> [B, T] float32.

    ``x`` may be f32 or bf16 (the tanh + recurrence run in x's dtype,
    matching the bf16io recipe); accumulation is always f32.
    Differentiable in ``x`` and ``w2``.  ``apply_tanh=False`` runs the
    Chebyshev recurrence on raw ``x`` (the ``ops.qkan_layer`` batched-layer
    semantics, where tanh lives upstream) -- callers then own the [-1, 1]
    domain guarantee, as with ``chebyshev_basis``.
    """
    return _fused_fwd(x, w2, dp1, interpret, apply_tanh)[0]


def _fused_fwd(x, w2, dp1, interpret, apply_tanh=True):
    tb = _batch_tile(x.shape[0])
    xp, b = _pad_batch(x, tb)
    bp = xp.shape[0]
    n = x.shape[1]
    t_dim = w2.shape[1]
    out = pl.pallas_call(
        partial(_fwd_kernel, dp1, apply_tanh, not interpret),
        grid=(bp // tb,),
        in_specs=[
            pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                w2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tb, t_dim), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bp, t_dim), jnp.float32),
        interpret=interpret,
    )(xp, w2)
    return out[:b], (x, w2)


def _fused_bwd(dp1, interpret, apply_tanh, res, g):
    x, w2 = res
    tb = _batch_tile(x.shape[0])
    xp, b = _pad_batch(x, tb)
    gp, _ = _pad_batch(g.astype(jnp.float32), tb)
    bp = xp.shape[0]
    n = x.shape[1]
    t_dim = w2.shape[1]
    dx, dw = pl.pallas_call(
        partial(_bwd_kernel, dp1, apply_tanh, not interpret),
        grid=(bp // tb,),
        in_specs=[
            pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                w2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tb, t_dim), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                w2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, n), x.dtype),
            jax.ShapeDtypeStruct(w2.shape, jnp.float32),
        ),
        interpret=interpret,
    )(xp, w2, gp)
    return dx[:b], dw.astype(w2.dtype)


kan_layer_fused.defvjp(_fused_fwd, _fused_bwd)
