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
The dx reduction runs as ONE [TB, T] @ [T, dp1*in] dot against the full
transposed weight (then an elementwise U-weighted segment sum over the
degree blocks) rather than dp1 narrow per-degree dots -- same math,
MXU-shaped (r5 retune).

``kan_train_step_fused`` additionally fuses a whole SINGLE-LAYER train
step (fwd + elementwise loss + dW) into one kernel: the loss cotangent
g is a per-row function of (out, y), so each batch tile can compute its
own g and accumulate dW without the basis, out, or g ever reaching HBM.
This is the only way to compute the basis ONCE per step -- a custom-vjp
pair (fwd kernel + bwd kernel) recomputes it in each -- and is the
measured headline-step lever (benchmarks/headline_roofline.json: the
honest XLA step's entire 0.042 ms overhead over the hoisted workload is
the backward's basis recompute).

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

# Default batch rows per grid step.  VMEM at TILE_B=256, in=784, D+1=6,
# f32: basis 4.8 MB + x/dx 0.8 MB each + W/dW 0.2 MB each -- comfortably
# under the ~16 MB budget for fwd and bwd alike.  Narrow layers afford
# far larger tiles (fewer grid steps, less per-tile fixed cost):
# ``_batch_tile`` scales the tile to a basis budget, and callers can pin
# ``tile_b`` explicitly (swept by benchmarks/fused_retune_probe.py).
TILE_B = 256
_BASIS_TILE_BUDGET_BYTES = 4 * 2**20


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


def _resolve_split(precision: str, interpret: bool) -> bool:
    """'high' -> manual bf16x3 on compiled TPU; 'default' -> one native
    pass (the device-default class -- correct where the contraction width
    is contract-verified harmless, e.g. the N=16 headline layer)."""
    if precision not in ("high", "default"):
        raise ValueError(
            f"unknown fused precision {precision!r}: 'high' or 'default'"
        )
    return precision == "high" and not interpret


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


def _dx_from_g(t, g, w_ref, dp1, apply_tanh, split):
    """dx tile from the output cotangent: one [TB, T] @ [T, dp1*in] dot
    against the full transposed weight, then the U-weighted sum over
    degree blocks (T'_d = d * U_{d-1})."""
    n = t.shape[1]
    gm = _dot_x3(g, w_ref[:].astype(g.dtype).T, split)  # [TB, dp1*in]
    us = [jnp.ones_like(t), 2.0 * t]
    for _ in range(3, dp1):
        us.append(2.0 * t * us[-1] - us[-2])
    dt = jnp.zeros(t.shape, dtype=jnp.float32)
    for d in range(1, dp1):
        dt += (float(d) * us[d - 1]) * gm[:, d * n : (d + 1) * n]
    return ((1.0 - t * t) * dt) if apply_tanh else dt


def _bwd_kernel(dp1, apply_tanh, split, x_ref, w_ref, g_ref, dx_ref, dw_ref):
    t = jnp.tanh(x_ref[:]) if apply_tanh else x_ref[:]
    g = g_ref[:]
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
    dx_ref[:] = _dx_from_g(t, g, w_ref, dp1, apply_tanh, split).astype(
        dx_ref.dtype
    )


def _batch_tile(b: int, feat_bytes: int | None = None) -> int:
    """Rows per tile: large enough to amortize per-tile fixed cost, small
    enough that the in-VMEM basis stays within the budget."""
    cap = TILE_B
    if feat_bytes:
        cap = max(
            TILE_B,
            min(4096, _BASIS_TILE_BUDGET_BYTES // feat_bytes // 256 * 256),
        )
    if b >= cap:
        return cap
    if b >= TILE_B:
        return b // 256 * 256 if b % 256 == 0 else max(8, -(-b // 8) * 8)
    return max(8, -(-b // 8) * 8)


def _pad_batch(x, tile):
    b = x.shape[0]
    pad = (-b) % tile
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)])
    return x, b


def _feat_bytes(n, dp1, dtype):
    """Bytes per basis row as MOSAIC ALLOCATES it, not as numpy counts it:
    each [tb, n] per-degree temporary is padded to 128 lanes, so a narrow
    layer (in=10 -> dp1*in=60) costs 12.8x its logical bytes in scoped
    vmem.  Budgeting logical bytes here let ``_batch_tile`` pick tb=4096
    on the flagship's narrow layers and the v1 backward blew the 16 MB
    scoped-vmem limit at 17.69 MB (r5 on-chip, flagship_train_step rerun)."""
    n_pad = -(-n // 128) * 128
    return n_pad * dp1 * jnp.dtype(dtype).itemsize


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def kan_layer_fused(
    x: jax.Array, w2: jax.Array, dp1: int, interpret: bool = False,
    apply_tanh: bool = True, precision: str = "high",
    tile_b: int | None = None,
):
    """Fused layer: [B, in] x degree-major [dp1*in, T] -> [B, T] float32.

    ``x`` may be f32 or bf16 (the tanh + recurrence run in x's dtype,
    matching the bf16io recipe); accumulation is always f32.
    Differentiable in ``x`` and ``w2``.  ``apply_tanh=False`` runs the
    Chebyshev recurrence on raw ``x`` (the ``ops.qkan_layer`` batched-layer
    semantics, where tanh lives upstream) -- callers then own the [-1, 1]
    domain guarantee, as with ``chebyshev_basis``.

    ``precision``: 'high' (default) buys ~f32-accurate dots via the manual
    bf16x3 split -- required at wide fan-in (the 5.6-accuracy-point
    finding); 'default' runs one native MXU pass per dot, the right class
    where the fan-in is contract-verified harmless (N=16).  ``tile_b``
    overrides the batch-tile heuristic (swept by
    benchmarks/fused_retune_probe.py).
    """
    return _fused_fwd(x, w2, dp1, interpret, apply_tanh, precision, tile_b)[0]


def _fused_fwd(x, w2, dp1, interpret, apply_tanh=True, precision="high",
               tile_b=None):
    split = _resolve_split(precision, interpret)
    tb = tile_b or _batch_tile(
        x.shape[0], _feat_bytes(x.shape[1], dp1, x.dtype)
    )
    xp, b = _pad_batch(x, tb)
    bp = xp.shape[0]
    n = x.shape[1]
    t_dim = w2.shape[1]
    out = pl.pallas_call(
        partial(_fwd_kernel, dp1, apply_tanh, split),
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


def _fused_bwd(dp1, interpret, apply_tanh, precision, tile_b, res, g):
    x, w2 = res
    split = _resolve_split(precision, interpret)
    tb = tile_b or _batch_tile(
        x.shape[0], _feat_bytes(x.shape[1], dp1, x.dtype)
    )
    xp, b = _pad_batch(x, tb)
    gp, _ = _pad_batch(g.astype(jnp.float32), tb)
    bp = xp.shape[0]
    n = x.shape[1]
    t_dim = w2.shape[1]
    dx, dw = pl.pallas_call(
        partial(_bwd_kernel, dp1, apply_tanh, split),
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


# -- fused single-layer train step -------------------------------------


def _step_kernel(dp1, apply_tanh, split, loss, inv_b,
                 x_ref, w_ref, y_ref, loss_ref, dw_ref):
    t = jnp.tanh(x_ref[:]) if apply_tanh else x_ref[:]
    basis = jnp.concatenate(_cheb_blocks(t, dp1), axis=1)
    out = _dot_x3(basis, w_ref[:].astype(basis.dtype), split)  # [TB, T]
    err = out if loss == "sumsq" else out - y_ref[:]
    g = ((2.0 * inv_b) * err) if loss == "mse" else 2.0 * err

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        loss_ref[0, 0] = 0.0

    dw_ref[:] += _dot_x3(basis.astype(jnp.float32).T, g, split).astype(
        dw_ref.dtype
    )
    contrib = jnp.sum(err * err)
    loss_ref[0, 0] += (contrib * inv_b) if loss == "mse" else contrib


def kan_train_step_fused(
    x: jax.Array,
    w2: jax.Array,
    dp1: int,
    y: jax.Array | None = None,
    loss: str = "sumsq",
    interpret: bool = False,
    apply_tanh: bool = True,
    precision: str = "default",
    tile_b: int | None = None,
):
    """One fused single-layer train step: returns ``(loss, dW)`` with the
    Chebyshev basis computed ONCE, entirely in VMEM.

    ``loss='sumsq'``: L = sum(out^2) (the headline-bench objective);
    ``loss='mse'``: L = mean((out - y)^2) over all B*T elements (the
    single-layer regression objective -- the market QKAN head).  Both
    cotangents are per-row functions of the tile's own ``out``, which is
    what lets fwd + bwd share one basis: a custom-vjp pair necessarily
    rebuilds the basis in each half (headline_roofline.json measures that
    recompute as the whole honest-vs-hoisted gap).  dX is not produced
    (single-layer step: the input is data, not an upstream activation).

    The batch must be a multiple of the tile (the step is a hot-loop
    primitive; padding policy belongs to the caller because padded rows
    would bias the 'mse' normalization).
    """
    if loss not in ("sumsq", "mse"):
        raise ValueError(f"unknown loss {loss!r}: 'sumsq' or 'mse'")
    if loss == "mse" and y is None:
        raise ValueError("loss='mse' needs targets y")
    split = _resolve_split(precision, interpret)
    b = x.shape[0]
    n = x.shape[1]
    t_dim = w2.shape[1]
    tb = tile_b or _batch_tile(b, _feat_bytes(n, dp1, x.dtype))
    tb = min(tb, b)
    if b % tb:
        raise ValueError(
            f"batch {b} must be a multiple of the tile {tb}; pad upstream"
        )
    if y is None:
        y = jnp.zeros((b, t_dim), jnp.float32)
    inv_b = 1.0 / float(b * t_dim)
    loss_out, dw = pl.pallas_call(
        partial(_step_kernel, dp1, apply_tanh, split, loss, inv_b),
        grid=(b // tb,),
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
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                w2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct(w2.shape, jnp.float32),
        ),
        interpret=interpret,
    )(x, w2, y.astype(jnp.float32))
    return loss_out[0, 0], dw.astype(w2.dtype)


# -- degree-wise fused layer (v2 schedule) ------------------------------
#
# The v1 kernels above CONCATENATE the full [TB, dp1*in] basis in VMEM.
# At wide fan-in that concat is the scoped-vmem bottleneck: the flagship
# layer-0 ([TB, 4704] f32 = 19 MB at TB=1024) blows Mosaic's 16 MB limit
# at any tile large enough to amortize grid overhead
# (benchmarks/records/fused_retune.json, r5).  The degree-wise schedule
# never materializes the basis: the Chebyshev recurrence runs degree by
# degree and each T_d tile is contracted IMMEDIATELY --
#
#     fwd   out  = sum_d T_d(t) @ W_d            (dp1 dots of [TB,in]@[in,T])
#     bwd   dW_d = T_d^T @ g                     (contract the batch dim)
#           dt  += d * U_{d-1} * (g @ W_d^T)
#           dx   = (1 - t^2) * dt                (tanh chain rule)
#
# so peak VMEM is a handful of [TB, in] temporaries (recurrence state)
# instead of dp1 of them concatenated.  d=0 is exact without a dot:
# T_0 = 1, so out_0 = colsum(W_0) broadcast and dW_0 = colsum(g)
# broadcast.  ``precision`` adds an explicit 'bf16' mode (operands cast
# to bf16, f32 accumulation -- the XLA bf16io class) next to 'high'
# (manual bf16x3) and 'default' (native pass on the given dtype).


def _resolve_mode(precision: str, interpret: bool) -> str:
    if precision not in ("high", "default", "bf16"):
        raise ValueError(
            f"unknown fused precision {precision!r}: "
            "'high', 'default', or 'bf16'"
        )
    if precision == "high":
        return "plain" if interpret else "x3"
    return "plain" if precision == "default" else "bf16"


def _dot_md(a, b, mode, dims=(((1,), (0,)), ((), ()))):
    """dot_general in one of three precision modes, f32 accumulation."""
    if mode == "bf16":
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), dims,
            preferred_element_type=jnp.float32,
        )
    if mode != "x3":
        return jax.lax.dot_general(
            a.astype(jnp.float32), b.astype(jnp.float32), dims,
            preferred_element_type=jnp.float32,
        )

    def d(p, q):
        return jax.lax.dot_general(
            p, q, dims, preferred_element_type=jnp.float32
        )

    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(a.dtype)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(b.dtype)).astype(jnp.bfloat16)
    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def _fwd_kernel_degreewise(dp1, apply_tanh, mode, x_ref, w_ref, out_ref):
    t = jnp.tanh(x_ref[:]) if apply_tanh else x_ref[:]
    n = t.shape[1]
    # T_0 = 1: exact broadcast of the W_0 column sums, no dot
    acc = jnp.broadcast_to(
        jnp.sum(w_ref[0:n, :].astype(jnp.float32), axis=0)[None, :],
        (t.shape[0], w_ref.shape[1]),
    )
    prev, cur = jnp.ones_like(t), t
    for d in range(1, dp1):
        acc = acc + _dot_md(cur, w_ref[d * n : (d + 1) * n, :], mode)
        prev, cur = cur, 2.0 * t * cur - prev
    out_ref[:] = acc.astype(out_ref.dtype)


def _bwd_kernel_degreewise(
    dp1, apply_tanh, mode, x_ref, w_ref, g_ref, dx_ref, dw_ref
):
    t = jnp.tanh(x_ref[:]) if apply_tanh else x_ref[:]
    g = g_ref[:]
    n = t.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    # dW_0 = 1^T @ g: exact broadcast of the g column sums
    dw_ref[0:n, :] += jnp.broadcast_to(
        jnp.sum(g.astype(jnp.float32), axis=0)[None, :],
        (n, dw_ref.shape[1]),
    ).astype(dw_ref.dtype)
    prev, cur = jnp.ones_like(t), t  # T_{d-1}, T_d
    # U_{d-1} with U_{-1} = 0, U_0 = 1: same 2t recurrence as T
    u_m2, u_m1 = 0.0, jnp.ones_like(t)
    dt = jnp.zeros(t.shape, dtype=jnp.float32)
    batch_dims = (((0,), (0,)), ((), ()))
    for d in range(1, dp1):
        dw_ref[d * n : (d + 1) * n, :] += _dot_md(
            cur, g, mode, batch_dims
        ).astype(dw_ref.dtype)
        gm_d = _dot_md(
            g, w_ref[d * n : (d + 1) * n, :], mode,
            (((1,), (1,)), ((), ())),  # contract T: [TB, T] x [in, T]^T
        )
        dt = dt + (float(d) * u_m1) * gm_d
        prev, cur = cur, 2.0 * t * cur - prev
        u_m2, u_m1 = u_m1, 2.0 * t * u_m1 - u_m2
    dx_ref[:] = (((1.0 - t * t) * dt) if apply_tanh else dt).astype(
        dx_ref.dtype
    )


def _batch_tile_degreewise(b: int, n: int, mode: str = "plain") -> int:
    """Rows per tile for the degree-wise schedule: ~7 [TB, in] f32
    recurrence temporaries live at once, with ``in`` LANE-PADDED to 128
    (Mosaic allocates [tb, 10] as [tb, 128] -- the r5 scoped-vmem
    finding); the 'x3' split roughly doubles live operand copies.
    Budgets are calibrated to the on-chip sweep (fused_retune.json r5):
    at in=784 (padded 896) tb512 plain/bf16 fits and tb768 OOMs; tb256
    'high' fits and tb512 OOMs.  Narrow layers get a hard ceiling (2048
    plain / 1024 x3) -- grid-overhead amortization is flat past it and
    the padded live set grows linearly in tb."""
    n_pad = -(-n // 128) * 128
    budget = 13 * 2**19 if mode == "x3" else 13 * 2**20
    ceil_tb = 1024 if mode == "x3" else 2048
    cap = max(256, min(ceil_tb, budget // (7 * n_pad * 4) // 256 * 256))
    if b >= cap:
        return cap
    return max(8, -(-b // 8) * 8)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def kan_layer_fused_dw(
    x: jax.Array, w2: jax.Array, dp1: int, interpret: bool = False,
    apply_tanh: bool = True, precision: str = "high",
    tile_b: int | None = None,
):
    """Degree-wise fused layer: same contract as ``kan_layer_fused``
    ([B, in] x degree-major [dp1*in, T] -> [B, T] f32, custom VJP) on the
    v2 schedule (module comment above): the basis is never materialized,
    so wide fan-in tiles fit VMEM.  ``precision`` adds 'bf16' (explicit
    one-pass bf16 operands, f32 accumulation -- the XLA bf16io class) to
    'high'/'default'."""
    return _fused_dw_fwd(
        x, w2, dp1, interpret, apply_tanh, precision, tile_b
    )[0]


def _fused_dw_fwd(x, w2, dp1, interpret, apply_tanh=True, precision="high",
                  tile_b=None):
    mode = _resolve_mode(precision, interpret)
    n = x.shape[1]
    tb = tile_b or _batch_tile_degreewise(x.shape[0], n, mode)
    xp, b = _pad_batch(x, tb)
    bp = xp.shape[0]
    t_dim = w2.shape[1]
    out = pl.pallas_call(
        partial(_fwd_kernel_degreewise, dp1, apply_tanh, mode),
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


def _fused_dw_bwd(dp1, interpret, apply_tanh, precision, tile_b, res, g):
    x, w2 = res
    mode = _resolve_mode(precision, interpret)
    n = x.shape[1]
    tb = tile_b or _batch_tile_degreewise(x.shape[0], n, mode)
    xp, b = _pad_batch(x, tb)
    gp, _ = _pad_batch(g.astype(jnp.float32), tb)
    bp = xp.shape[0]
    t_dim = w2.shape[1]
    dx, dw = pl.pallas_call(
        partial(_bwd_kernel_degreewise, dp1, apply_tanh, mode),
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


kan_layer_fused_dw.defvjp(_fused_dw_fwd, _fused_dw_bwd)
