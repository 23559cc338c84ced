"""Pallas TPU kernels for the statevector hot paths.

The dominant gate in FABLE block-encoding simulation is the fused
uniformly-controlled Ry: with the rotation target as the most significant
qubit (exactly how ``encoding.fable`` lays circuits out), the statevector
splits as psi = [2, M] and the update is a pure elementwise stream --

    new0[c] = cos(theta[c]/2) * psi0[c] - sin(theta[c]/2) * psi1[c]
    new1[c] = sin(theta[c]/2) * psi0[c] + cos(theta[c]/2) * psi1[c]

one HBM pass over three arrays, ideal VPU work.  These kernels keep the
whole update (trig + 4 mul + 2 add) in VMEM tiles so large statevectors run
at memory bandwidth.  Diagonal multiplication gets the same treatment.

All kernels operate on real dtype (everything FABLE emits is real); tests
run them in interpret mode on CPU, and ``simulate_fable_pallas`` wires them
into a full block-encoding simulation on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile: one VPU-friendly block.  The flat arrays are reshaped to
# [rows, LANES]; SUBLANES rows are processed per grid step.
LANES = 128
SUBLANES = 8
TILE = LANES * SUBLANES
# HBM streaming wants large DMA blocks: up to BLOCK_ROWS rows (x LANES x 4B
# = 256 KB) per grid step, shrinking to fit small inputs.
BLOCK_ROWS = 512


def _rows_per_block(rows: int) -> int:
    b = BLOCK_ROWS
    while rows % b != 0:
        b //= 2
    return b


def _ucry_kernel(psi0_ref, psi1_ref, theta_ref, out0_ref, out1_ref):
    half = theta_ref[:] * 0.5
    c = jnp.cos(half)
    s = jnp.sin(half)
    p0 = psi0_ref[:]
    p1 = psi1_ref[:]
    out0_ref[:] = c * p0 - s * p1
    out1_ref[:] = s * p0 + c * p1


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def ucry_msb_pallas(psi: jax.Array, thetas: jax.Array, interpret: bool = False):
    """Apply a uniformly-controlled Ry targeting the MSB qubit.

    ``psi``: flat [2*M] real statevector; ``thetas``: [M] angles indexed by
    the low bits.  M must be a multiple of the 8x128 tile (true for any
    FABLE circuit with >= 10 low qubits; smaller sizes take the XLA path).

    Differentiable in both arguments (custom VJP: the psi-cotangent is the
    inverse rotation, run through the same kernel; dL/dtheta =
    (g1*y0 - g0*y1)/2 elementwise) -- pallas_call has no autodiff rule of
    its own, and the traced-angle path is the quantum-training hot op.
    """
    return _ucry_msb_impl(psi, thetas, interpret)


def _ucry_fwd(psi, thetas, interpret):
    out = _ucry_msb_impl(psi, thetas, interpret)
    return out, (out, thetas)


def _ucry_bwd(interpret, res, g):
    out, thetas = res
    m = thetas.shape[0]
    dpsi = _ucry_msb_impl(g, -thetas, interpret)
    g0, g1 = g[:m], g[m:]
    y0, y1 = out[:m], out[m:]
    dtheta = 0.5 * (g1 * y0 - g0 * y1)
    return dpsi, dtheta.astype(thetas.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def _ucry_msb_impl(psi: jax.Array, thetas: jax.Array, interpret: bool = False):
    m = thetas.shape[0]
    if m % TILE != 0:
        raise ValueError(f"size {m} not a multiple of {TILE}")
    rows = m // LANES
    block_rows = _rows_per_block(rows)
    grid = rows // block_rows
    psi0 = psi[:m].reshape(rows, LANES)
    psi1 = psi[m:].reshape(rows, LANES)
    th = thetas.reshape(rows, LANES).astype(psi.dtype)

    spec = pl.BlockSpec(
        (block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out0, out1 = pl.pallas_call(
        _ucry_kernel,
        grid=(grid,),
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), psi.dtype),
            jax.ShapeDtypeStruct((rows, LANES), psi.dtype),
        ),
        interpret=interpret,
    )(psi0, psi1, th)
    return jnp.concatenate([out0.reshape(-1), out1.reshape(-1)])


ucry_msb_pallas.defvjp(_ucry_fwd, _ucry_bwd)


def _ucry_cs_kernel(psi0_ref, psi1_ref, c_ref, s_ref, out0_ref, out1_ref):
    c = c_ref[:]
    s = s_ref[:]
    p0 = psi0_ref[:]
    p1 = psi1_ref[:]
    out0_ref[:] = c * p0 - s * p1
    out1_ref[:] = s * p0 + c * p1


@partial(jax.jit, static_argnames=("interpret",))
def ucry_msb_cs_pallas(
    psi: jax.Array, cos_half: jax.Array, sin_half: jax.Array,
    interpret: bool = False,
):
    """MSB-targeted multiplexed Ry with precomputed cos/sin(theta/2).

    The trig-free variant: the plain kernel is transcendental-bound (~2M
    cos/sin per gate dominate the 21-qubit timing), so when angles are
    static -- every FABLE circuit -- the host computes c/s once and the
    kernel runs at memory speed.  ``simulate(backend='auto')`` uses this
    path automatically for static-parameter circuits.
    """
    m = cos_half.shape[0]
    if m % TILE != 0:
        raise ValueError(f"size {m} not a multiple of {TILE}")
    rows = m // LANES
    block_rows = _rows_per_block(rows)
    psi0 = psi[:m].reshape(rows, LANES)
    psi1 = psi[m:].reshape(rows, LANES)
    c = cos_half.reshape(rows, LANES).astype(psi.dtype)
    s = sin_half.reshape(rows, LANES).astype(psi.dtype)
    spec = pl.BlockSpec(
        (block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out0, out1 = pl.pallas_call(
        _ucry_cs_kernel,
        grid=(rows // block_rows,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), psi.dtype),
            jax.ShapeDtypeStruct((rows, LANES), psi.dtype),
        ),
        interpret=interpret,
    )(psi0, psi1, c, s)
    return jnp.concatenate([out0.reshape(-1), out1.reshape(-1)])


def _ucry_cs_pair_kernel(v_ref, c_ref, s_ref, out_ref):
    p0 = v_ref[0]
    p1 = v_ref[1]
    c = c_ref[:]
    s = s_ref[:]
    out_ref[0] = c * p0 - s * p1
    out_ref[1] = s * p0 + c * p1


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def ucry_msb_cs_pallas_pair(
    psi: jax.Array, cos_half: jax.Array, sin_half: jax.Array,
    interpret: bool = False,
):
    """Sliceless trig-free MSB multiplexed Ry: both halves ride ONE block.

    Differentiable (custom VJP): the psi-cotangent is the inverse rotation
    through the same kernel; c/s cotangents are elementwise products.

    ``ucry_msb_cs_pallas`` pre-slices psi[:m] / psi[m:] and concatenates the
    results -- three extra full-state HBM passes that XLA does not fuse into
    the pallas_call (measured: 0.68 ms/gate scan-chained at 21 qubits vs the
    0.05 ms kernel).  Here the flat state reshapes (free, contiguous) to
    [2, rows, LANES] and each grid step's BlockSpec carries BOTH halves, so
    HBM sees exactly psi read + cos/sin read + psi write.
    """
    m = cos_half.shape[0]
    if m % TILE != 0:
        raise ValueError(f"size {m} not a multiple of {TILE}")
    rows = m // LANES
    block_rows = _rows_per_block(rows)
    v = psi.reshape(2, rows, LANES)
    c = cos_half.reshape(rows, LANES).astype(psi.dtype)
    s = sin_half.reshape(rows, LANES).astype(psi.dtype)
    pair_spec = pl.BlockSpec(
        (2, block_rows, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    half_spec = pl.BlockSpec(
        (block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _ucry_cs_pair_kernel,
        grid=(rows // block_rows,),
        in_specs=[pair_spec, half_spec, half_spec],
        out_specs=pair_spec,
        out_shape=jax.ShapeDtypeStruct((2, rows, LANES), psi.dtype),
        interpret=interpret,
    )(v, c, s)
    return out.reshape(-1)


def _ucry_pair_fwd(psi, cos_half, sin_half, interpret):
    out = ucry_msb_cs_pallas_pair.__wrapped__(
        psi, cos_half, sin_half, interpret
    )
    return out, (psi, cos_half, sin_half)


def _ucry_pair_bwd(interpret, res, g):
    psi, c, s = res
    m = c.shape[0]
    dpsi = ucry_msb_cs_pallas_pair.__wrapped__(g, c, -s, interpret)
    g0, g1 = g[:m], g[m:]
    p0, p1 = psi[:m], psi[m:]
    dc = g0 * p0 + g1 * p1
    ds = g1 * p0 - g0 * p1
    return dpsi, dc.astype(c.dtype), ds.astype(s.dtype)


ucry_msb_cs_pallas_pair.defvjp(_ucry_pair_fwd, _ucry_pair_bwd)


def _diag_kernel(psi_ref, diag_ref, out_ref):
    out_ref[:] = psi_ref[:] * diag_ref[:]


@partial(jax.jit, static_argnames=("interpret",))
def diag_mult_pallas(psi: jax.Array, diag: jax.Array, interpret: bool = False):
    """Elementwise diagonal-gate multiply over the full statevector."""
    n = psi.shape[0]
    if n % TILE != 0:
        raise ValueError(f"size {n} not a multiple of {TILE}")
    rows = n // LANES
    block_rows = _rows_per_block(rows)
    spec = pl.BlockSpec(
        (block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _diag_kernel,
        grid=(rows // block_rows,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), psi.dtype),
        interpret=interpret,
    )(psi.reshape(rows, LANES), diag.reshape(rows, LANES).astype(psi.dtype))
    return out.reshape(-1)


def _h_pair_kernel(h0_ref, h1_ref, out0_ref, out1_ref):
    inv_sqrt2 = 0.7071067811865476
    a = h0_ref[:]
    b = h1_ref[:]
    out0_ref[:] = (a + b) * inv_sqrt2
    out1_ref[:] = (a - b) * inv_sqrt2


@partial(jax.jit, static_argnames=("qubit", "interpret"))
def h_gate_pallas(psi: jax.Array, qubit: int, interpret: bool = False):
    """Hadamard on an arbitrary qubit via a strided-pair streaming kernel.

    The statevector is viewed as [outer, 2, inner] with inner = 2^qubit and
    the kernel reads both halves of the *same* array through two BlockSpec
    index maps (no strided-copy prologue).  Requires inner >= 128 lanes and
    outer >= 8 sublanes; other cases take the XLA path.
    """
    n = psi.shape[0]
    inner = 2**qubit
    outer = n // (2 * inner)
    if inner % TILE == 0:
        # large inner: tile entirely within each half
        rows = inner // TILE
        v = psi.reshape(outer, 2, rows, SUBLANES, LANES)
        grid = (outer, rows)
        blk = (1, 1, 1, SUBLANES, LANES)
        spec0 = pl.BlockSpec(
            blk, lambda o, r: (o, 0, r, 0, 0), memory_space=pltpu.VMEM
        )
        spec1 = pl.BlockSpec(
            blk, lambda o, r: (o, 1, r, 0, 0), memory_space=pltpu.VMEM
        )
        half_spec = pl.BlockSpec(
            blk, lambda o, r: (o, 0, r, 0, 0), memory_space=pltpu.VMEM
        )
        half_shape = jax.ShapeDtypeStruct(
            (outer, 1, rows, SUBLANES, LANES), psi.dtype
        )
    elif inner % LANES == 0 and outer % SUBLANES == 0:
        # medium inner: sublanes come from the outer axis
        v = psi.reshape(outer, 2, inner)
        grid = (outer // SUBLANES, inner // LANES)
        blk = (SUBLANES, 1, LANES)
        spec0 = pl.BlockSpec(
            blk, lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        )
        spec1 = pl.BlockSpec(
            blk, lambda i, j: (i, 1, j), memory_space=pltpu.VMEM
        )
        half_spec = pl.BlockSpec(
            blk, lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        )
        half_shape = jax.ShapeDtypeStruct((outer, 1, inner), psi.dtype)
    elif (n // 2) % TILE == 0:
        # fallback: gather the strided halves into contiguous tiles (one
        # copy each way; still beats nothing for awkward mid qubits)
        half = psi.reshape(outer, 2, inner)
        h0 = half[:, 0, :].reshape(-1)
        h1 = half[:, 1, :].reshape(-1)
        rows = (n // 2) // LANES
        spec = pl.BlockSpec(
            (SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        out0, out1 = pl.pallas_call(
            _h_pair_kernel,
            grid=(rows // SUBLANES,),
            in_specs=[spec, spec],
            out_specs=(spec, spec),
            out_shape=(
                jax.ShapeDtypeStruct((rows, LANES), psi.dtype),
                jax.ShapeDtypeStruct((rows, LANES), psi.dtype),
            ),
            interpret=interpret,
        )(h0.reshape(rows, LANES), h1.reshape(rows, LANES))
        out = jnp.stack(
            [out0.reshape(outer, inner), out1.reshape(outer, inner)], axis=1
        )
        return out.reshape(-1)
    else:
        raise ValueError(
            f"h_gate_pallas tiling unsupported for qubit {qubit} of {n} "
            f"amplitudes (use the XLA path)"
        )
    out0, out1 = pl.pallas_call(
        _h_pair_kernel,
        grid=grid,
        in_specs=[spec0, spec1],
        out_specs=(half_spec, half_spec),
        out_shape=(half_shape, half_shape),
        interpret=interpret,
    )(v, v)
    return jnp.concatenate([out0, out1], axis=1).reshape(-1)


def simulate_fable_pallas(
    a: np.ndarray, psi0: jax.Array | None = None, interpret: bool = False
):
    """Simulate a FABLE block-encoding circuit with the Pallas kernels.

    Builds the circuit structure analytically (H on the row register, the
    fused ucry, register swap, H again) and executes every stage with the
    streaming kernels above where tile constraints allow, falling back to
    the XLA ops otherwise.  Returns ``(psi, alpha)``: the final
    statevector and the FABLE subnormalization.
    """
    from qkan_implementation_tpu.encoding.fable import fable
    from qkan_implementation_tpu.sim.statevector import apply_gate, zero_state

    circ, alpha = fable(a)
    q = circ.num_qubits
    dim = 2**q
    psi = zero_state(q, jnp.float32) if psi0 is None else psi0
    for gate in circ.gates:
        # the MSB kernel indexes thetas by the state's low bits, so the
        # control register must be the full descending run (the same guard
        # as statevector._pallas_eligible) -- anything else falls back
        if (
            gate.name == "ucry"
            and gate.qubits[0] == q - 1
            and tuple(gate.qubits[1:]) == tuple(range(q - 2, -1, -1))
            and dim // 2 >= TILE
        ):
            thetas = jnp.asarray(np.asarray(gate.params), dtype=psi.dtype)
            psi = ucry_msb_pallas(psi, thetas, interpret=interpret)
        elif (
            gate.name == "h"
            and dim // 2 >= TILE
            and (2 ** gate.qubits[0]) % LANES == 0
        ):
            psi = h_gate_pallas(psi, gate.qubits[0], interpret=interpret)
        else:
            psi = apply_gate(psi, gate, q)
    return psi, alpha
