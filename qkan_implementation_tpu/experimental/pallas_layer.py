"""Pallas-fused batched QKAN layer -- EXPERIMENTAL NEGATIVE RESULT.

Measured 5.8x SLOWER than the XLA lowering it set out to beat (1.4e8 vs
8.1e8 layers/s at N=K=16 deg 7, records/layer_variants.json): at these
working-set sizes the "materialized" basis XLA allegedly writes to HBM is
actually fused/kept in registers by XLA itself, while the hand-rolled
kernel pays Mosaic's grid overheads.  Kept under ``experimental`` as the
recorded negative result (VERDICT r2 weak 7); NOTHING in the production
path imports it -- use ``ops.qkan_layer.qkan_layer_forward_batched``.

Original design notes:

Batched QKAN layer with the basis kept in VMEM, HBM seeing only x.

The batched layer (``ops.qkan_layer.qkan_layer_forward_batched``) is one
[B, N*(D+1)] @ [N*(D+1), K] matmul, but XLA materializes the Chebyshev
basis [B, N*(D+1)] to HBM between the elementwise producer and the dot --
at N=16, D=7 that is 8x the input traffic, and the benchmark becomes a
bandwidth test of an array that never needed to exist.  These kernels
compute the basis tile-by-tile in VMEM (T_d via the recurrence) and feed
the MXU directly, for forward AND backward:

    traffic/sample: fwd  x (64B) + out (64B)
                    bwd  x (64B) + dout (64B) + dx (64B)

vs ~1.5 KB/sample for the materialized pipeline.  The weight tensor is
tiny ([D+1, N, K], 8 KB) and lives in VMEM for every grid step; dM is
accumulated across grid steps through output revisiting.

Gradient math (custom VJP):
    out[b,k]  = sum_{n,d} T_d(x[b,n]) M[d,n,k]
    dM[d,n,k] = sum_b T_d(x[b,n]) dout[b,k]          (per-degree [N,K] GEMM)
    dx[b,n]   = sum_d T'_d(x[b,n]) (dout @ M[d]^T)[b,n],  T'_d = d*U_{d-1}

Reference semantics: QKAN_Steps_original/QKANLayer.py:77-135 (the fused
contraction form; see ops.qkan_layer.qkan_weight_tensor).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_B = 2048  # batch rows per grid step (fits the 16 MB scoped-VMEM limit)


def _cheb_tiles(xs, dp1):
    """T_0..T_{dp1-1} of a [TB, N] tile via the recurrence (all in VMEM)."""
    ts = [jnp.ones_like(xs), xs]
    for _ in range(2, dp1):
        ts.append(2.0 * xs * ts[-1] - ts[-2])
    return ts[:dp1]


def _fwd_kernel(dp1, x_ref, m_ref, out_ref):
    xs = x_ref[:]
    # degree-major basis tile [TB, (D+1)*N] pairs with the 2-D [dp1*N, K]
    # weight block: ONE wide MXU dot (contraction depth (D+1)*N) instead of
    # D+1 narrow ones.  (m stays 2-D: Mosaic rejects 2D<->3D vector casts.)
    basis = jnp.concatenate(_cheb_tiles(xs, dp1), axis=1)
    out_ref[:] = jnp.dot(
        basis, m_ref[:], preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _bwd_kernel(dp1, x_ref, m_ref, dout_ref, dx_ref, dm_ref):
    xs = x_ref[:]
    g = dout_ref[:]
    n = xs.shape[1]
    basis = jnp.concatenate(_cheb_tiles(xs, dp1), axis=1)  # [TB, dp1*n]

    # dM accumulation across grid steps: zero on first visit, += after
    @pl.when(pl.program_id(0) == 0)
    def _():
        dm_ref[:] = jnp.zeros_like(dm_ref)

    # dM[dn, k] += sum_b basis[b, dn] g[b, k]: one [dp1*n, TB] @ [TB, k]
    dm_ref[:] += jnp.dot(
        basis.T, g, preferred_element_type=jnp.float32
    ).astype(dm_ref.dtype)

    # dx[b,n] = sum_d T'_d(x)[b,n] * (g @ M[d]^T)[b,n], T'_d = d * U_{d-1};
    # per-degree [TB,k]@[k,n] matmuls (row slices of m are cheap; no
    # in-kernel 3-D reshapes)
    us = [jnp.ones_like(xs), 2.0 * xs]
    for _ in range(3, dp1):
        us.append(2.0 * xs * us[-1] - us[-2])
    dx = jnp.zeros(xs.shape, dtype=jnp.float32)
    for d in range(1, dp1):
        gm_d = jnp.dot(
            g, m_ref[d * n : (d + 1) * n, :].T,
            preferred_element_type=jnp.float32,
        )
        dx += (float(d) * us[d - 1]) * gm_d
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _pad_batch(x, tile):
    b = x.shape[0]
    pad = (-b) % tile
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)])
    return x, b


def _batch_tile(b: int) -> int:
    """Batch rows per grid step: the full TILE_B for large batches, else
    the batch rounded up to a sublane multiple -- a B=256 step then runs
    one 256-row tile instead of padding to 2048 (8x the FLOPs and HBM
    traffic for nothing)."""
    if b >= TILE_B:
        return TILE_B
    return max(8, -(-b // 8) * 8)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def qkan_layer_fused(x: jax.Array, m3: jax.Array, interpret: bool = False):
    """Fused batched layer forward: [B, N] x [D+1, N, K] -> [B, K].

    ``m3`` is the layer contraction tensor in degree-major layout
    (``qkan_weight_tensor(weights, N, K)`` transposed to [D+1, N, K]).
    Fully differentiable in both arguments (fused backward kernel).
    """
    return _fused_fwd(x, m3, interpret)[0]


def _fused_fwd(x, m3, interpret):
    tb = _batch_tile(x.shape[0])
    xp, b = _pad_batch(x, tb)
    bp = xp.shape[0]
    grid = bp // tb
    n = x.shape[1]
    dp1, _, k = m3.shape
    m2 = m3.reshape(dp1 * n, k)  # kernels take the 2-D layout
    x_spec = pl.BlockSpec(
        (tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    m_spec = pl.BlockSpec(
        m2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        partial(_fwd_kernel, dp1),
        grid=(grid,),
        in_specs=[x_spec, m_spec],
        out_specs=pl.BlockSpec(
            (tb, k), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bp, k), x.dtype),
        interpret=interpret,
    )(xp, m2)
    return out[:b], (x, m3)


def _fused_bwd(interpret, res, dout):
    x, m3 = res
    tb = _batch_tile(x.shape[0])
    xp, b = _pad_batch(x, tb)
    doutp, _ = _pad_batch(dout, tb)
    bp = xp.shape[0]
    grid = bp // tb
    n = x.shape[1]
    dp1, _, k = m3.shape
    m2 = m3.reshape(dp1 * n, k)
    x_spec = pl.BlockSpec(
        (tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    m_spec = pl.BlockSpec(
        m2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    g_spec = pl.BlockSpec(
        (tb, k), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    dx, dm = pl.pallas_call(
        partial(_bwd_kernel, dp1),
        grid=(grid,),
        in_specs=[x_spec, m_spec, g_spec],
        out_specs=(
            pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(m2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, n), x.dtype),
            jax.ShapeDtypeStruct(m2.shape, m3.dtype),
        ),
        interpret=interpret,
    )(xp, m2, doutp)
    return dx[:b], dm.reshape(m3.shape)


qkan_layer_fused.defvjp(_fused_fwd, _fused_bwd)


def _bwd_dw_kernel(dp1, x_ref, dout_ref, dm_ref):
    """Weight-cotangent-only backward: the per-degree dx matmuls and the
    dx stream are skipped entirely -- HBM sees x + dout in, dM out."""
    xs = x_ref[:]
    g = dout_ref[:]
    basis = jnp.concatenate(_cheb_tiles(xs, dp1), axis=1)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dm_ref[:] = jnp.zeros_like(dm_ref)

    dm_ref[:] += jnp.dot(
        basis.T, g, preferred_element_type=jnp.float32
    ).astype(dm_ref.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def qkan_layer_fused_dw(x: jax.Array, m3: jax.Array, interpret: bool = False):
    """Forward identical to ``qkan_layer_fused``; backward produces ONLY the
    weight cotangent (dx comes back as zeros).

    For weight-only training loops where ``x`` is input data (or already
    detached): layer 0 of a network, single-layer fits, last-layer tuning.
    The backward kernel drops the D per-degree [B,K]@[K,N] dx matmuls and
    the dx output stream -- per sample the backward pass reads x + dout and
    writes nothing but the accumulated [D+1, N, K] dM tile.

    WARNING: do NOT compose under layers whose inputs carry gradient -- the
    zero dx silently truncates the chain rule there; use
    ``qkan_layer_fused`` for hidden layers.
    """
    return _fused_fwd(x, m3, interpret)[0]


def _fused_dw_fwd(x, m3, interpret):
    return _fused_fwd(x, m3, interpret)


def _fused_dw_bwd(interpret, res, dout):
    x, m3 = res
    tb = _batch_tile(x.shape[0])
    xp, b = _pad_batch(x, tb)
    doutp, _ = _pad_batch(dout, tb)
    bp = xp.shape[0]
    grid = bp // tb
    n = x.shape[1]
    dp1, _, k = m3.shape
    x_spec = pl.BlockSpec(
        (tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    g_spec = pl.BlockSpec(
        (tb, k), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    dm = pl.pallas_call(
        partial(_bwd_dw_kernel, dp1),
        grid=(grid,),
        in_specs=[x_spec, g_spec],
        out_specs=pl.BlockSpec(
            (dp1 * n, k), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((dp1 * n, k), m3.dtype),
        interpret=interpret,
    )(xp, doutp)
    return jnp.zeros_like(x), dm.reshape(m3.shape)


qkan_layer_fused_dw.defvjp(_fused_dw_fwd, _fused_dw_bwd)


def weights_to_m3(weights: jax.Array, N: int, K: int) -> jax.Array:
    """Per-degree weight vectors [D+1, N*K] -> fused tensor [D+1, N, K]."""
    from qkan_implementation_tpu.ops.qkan_layer import qkan_weight_tensor

    return jnp.transpose(qkan_weight_tensor(weights, N, K), (2, 1, 0))


def qkan_layer_forward_batched_fused(
    x: jax.Array, weights: jax.Array, N: int, K: int, interpret: bool = False
) -> jax.Array:
    """Drop-in fused equivalent of ``qkan_layer_forward_batched``."""
    return qkan_layer_fused(x, weights_to_m3(weights, N, K), interpret)
