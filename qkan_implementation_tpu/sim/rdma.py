"""Fused RDMA exchange + gate kernels: comm/compute overlap on the ICI.

The sharded engine's qubit-remapping exchange (``sim.sharded``) moves a
global qubit into the local region so a gate can act on it.  The collective
path is two full steps: a ``ppermute`` of half the local block, THEN the
gate pass over the whole block -- the ICI sits idle during compute and the
VPU sits idle during the exchange.  The dominant consumers of exchanges are
FABLE's fused multiplexed Ry when its rotation target is a global qubit
(reference ``QKAN_Steps_original/MulStep.py:115-166`` runs these at every
layer) and the H walls around it, and for both the two steps fuse into ONE
Pallas kernel built on a shared double-buffered protocol:

- the half-block each device must send is *contiguous* when the exchange
  victim is the local MSB (the slot ``sim.sharded`` already prefers), so the
  send is a straight chunked RDMA out of HBM;
- the gate pairs each kept amplitude elementwise with exactly the
  amplitude being received (post-exchange slot 0 / slot 1 of the target
  qubit), so as soon as chunk ``i`` lands its transformed output chunks can
  be computed and written while chunk ``i+1`` is still in flight.

Protocol per device (double-buffered, 2 VMEM slots per stream):

    barrier(partner)                      # partner's buffers are alive
    start send 0, 1   (RDMA: my half -> partner recv slot i%2)
    start keep + coefficient fetches 0, 1 (local HBM -> VMEM)
    for i in chunks:
        wait recv[i%2], keep[i%2], coeff streams [i%2]
        compute: (p0, p1) = kept/received by device bit; 2x2 -> out VMEM
        start out DMA chunk i;  signal capacity -> partner
        start send i+2 (after capacity credit + send i complete), fetches i+2

Flow control: a device may not send chunk ``i+2`` until its partner has
consumed chunk ``i`` from the shared recv slot (REGULAR capacity
semaphore, remote-signaled).  Both devices run the same program in
lockstep, so credits are always granted post-compute and the protocol is
deadlock-free.

Two gates instantiate the protocol:

- ``ucry_exchange_fused_rdma``: multiplexed Ry, two streamed coefficient
  inputs (cos/sin of the device-selected half angles);
- ``h_exchange_fused_rdma``: Hadamard, zero coefficient streams (its 2x2
  is constant) -- HBM sees keep-half in + both halves out only.

HBM traffic per device (ucry): read keep half + cos + sin, write both
output halves; the sent half streams HBM->ICI and lands in the partner's
VMEM -- one full-block read + one full-block write, the same as a *local*
fused ucry pass.  The exchange rides free under the compute.

Tested against the collective path on the 8-virtual-device CPU mesh via
Pallas TPU interpret mode (which simulates remote DMAs and semaphores).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qkan_implementation_tpu.sim.pallas_kernels import LANES, TILE

# Rows of 128 lanes per chunk; up to 7 double-buffered streams (recv, keep,
# 2 coeffs, out0, out1) x 2 slots x 256 rows x 128 lanes x 4 B = 1.5 MB VMEM.
CHUNK_ROWS = 256

_COLLECTIVE_ID = 7  # barrier-semaphore group for the exchange kernels


def _chunk_rows_for(rows: int) -> int:
    c = min(CHUNK_ROWS, rows)
    while rows % c != 0:
        c //= 2
    return c


def _protocol_kernel(
    dev_bit: int,
    axis_name: str,
    nchunks: int,
    chunk_rows: int,
    nstreams: int,
    compute,
    x_ref,      # [2, rows, LANES] ANY (HBM): my block, halves by local MSB
    *rest,
):
    """The shared double-buffered exchange protocol (module docstring).

    ``rest`` layout (inputs, then output, then scratch in pallas_call
    order): ``nstreams`` coefficient HBM refs ([rows, LANES] each), the
    output ref ([2, rows, LANES], halves by target bit), recv/keep VMEM
    buffers, ``nstreams`` coefficient VMEM buffers, the out VMEM buffer,
    then DMA semaphores (send, recv, keep, per-stream, out) and the
    capacity REGULAR semaphore.  ``compute(p0, p1, coeffs)`` applies the
    gate's 2x2 to the post-exchange pair and returns (out0, out1).
    """
    streams = rest[:nstreams]
    o_ref = rest[nstreams]
    recv_buf = rest[nstreams + 1]
    keep_buf = rest[nstreams + 2]
    stream_bufs = rest[nstreams + 3 : 2 * nstreams + 3]
    out_buf = rest[2 * nstreams + 3]
    send_sem = rest[2 * nstreams + 4]
    recv_sem = rest[2 * nstreams + 5]
    keep_sem = rest[2 * nstreams + 6]
    stream_sems = rest[2 * nstreams + 7 : 3 * nstreams + 7]
    out_sem = rest[3 * nstreams + 7]
    cap_sem = rest[3 * nstreams + 8]

    my = jax.lax.axis_index(axis_name)
    partner = my ^ (1 << dev_bit)
    g = (my >> dev_bit) & 1

    # Partner's out/recv buffers must exist before any RDMA targets them.
    bar = pltpu.get_barrier_semaphore()
    pltpu.semaphore_signal(
        bar, inc=1, device_id=partner,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    pltpu.semaphore_wait(bar, 1)

    def send_rdma(i, slot):
        # my half (1-g), chunk i -> partner's recv slot.  The partner (bit
        # 1-g) merges it as its post-exchange target-bit-(1-g)... which by
        # symmetry is MY g; both sides compute the same descriptor shape.
        return pltpu.make_async_remote_copy(
            src_ref=x_ref.at[1 - g, pl.ds(i * chunk_rows, chunk_rows)],
            dst_ref=recv_buf.at[slot],
            send_sem=send_sem.at[slot],
            recv_sem=recv_sem.at[slot],
            device_id=partner,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    def keep_dma(i, slot):
        return pltpu.make_async_copy(
            x_ref.at[g, pl.ds(i * chunk_rows, chunk_rows)],
            keep_buf.at[slot],
            keep_sem.at[slot],
        )

    def stream_dma(k, i, slot):
        return pltpu.make_async_copy(
            streams[k].at[pl.ds(i * chunk_rows, chunk_rows)],
            stream_bufs[k].at[slot],
            stream_sems[k].at[slot],
        )

    def out_dma(i, slot, t):
        return pltpu.make_async_copy(
            out_buf.at[slot, t],
            o_ref.at[t, pl.ds(i * chunk_rows, chunk_rows)],
            out_sem.at[slot, t],
        )

    def start_chunk(i, slot):
        send_rdma(i, slot).start()
        keep_dma(i, slot).start()
        for k in range(nstreams):
            stream_dma(k, i, slot).start()

    # Prologue: fill both slots.
    start_chunk(0, 0)
    if nchunks > 1:
        start_chunk(1, 1)

    def body(i, _):
        slot = jax.lax.rem(i, 2)

        # Reusing out_buf[slot]: chunk i-2's writeback must have drained.
        @pl.when(i >= 2)
        def _():
            out_dma(i - 2, slot, 0).wait()
            out_dma(i - 2, slot, 1).wait()

        send_rdma(i, slot).wait_recv()
        keep_dma(i, slot).wait()
        for k in range(nstreams):
            stream_dma(k, i, slot).wait()

        kept = keep_buf[slot]
        received = recv_buf[slot]
        # Post-exchange, my block holds target-bit = anything, old-MSB = g:
        # kept is (target=g), received is (target=1-g).
        p0 = jnp.where(g == 0, kept, received)
        p1 = jnp.where(g == 0, received, kept)
        out0, out1 = compute(p0, p1, tuple(b[slot] for b in stream_bufs))
        out_buf[slot, 0] = out0
        out_buf[slot, 1] = out1
        out_dma(i, slot, 0).start()
        out_dma(i, slot, 1).start()

        # recv_buf[slot] consumed: grant the partner a send credit.
        pltpu.semaphore_signal(
            cap_sem, inc=1, device_id=partner,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

        @pl.when(i + 2 < nchunks)
        def _():
            # Slot reuse: my send i must have left (send_sem) and the
            # partner must have freed its recv slot (capacity credit).
            send_rdma(i, slot).wait_send()
            pltpu.semaphore_wait(cap_sem, 1)
            start_chunk(i + 2, slot)

        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)

    # Epilogue: drain the last sends, credits, and output writebacks.
    last = nchunks - 1
    send_rdma(last, jax.lax.rem(last, 2)).wait_send()
    if nchunks > 1:
        send_rdma(last - 1, jax.lax.rem(last - 1, 2)).wait_send()
        pltpu.semaphore_wait(cap_sem, 2)
        out_dma(last - 1, jax.lax.rem(last - 1, 2), 0).wait()
        out_dma(last - 1, jax.lax.rem(last - 1, 2), 1).wait()
    else:
        pltpu.semaphore_wait(cap_sem, 1)
    out_dma(last, jax.lax.rem(last, 2), 0).wait()
    out_dma(last, jax.lax.rem(last, 2), 1).wait()


def _launch(block, coeffs, dev_bit, axis_name, chunk_rows, compute,
            interpret):
    """Build and run the protocol's ``pallas_call`` for a gate.

    ``coeffs``: tuple of [rows*LANES] streamed coefficient vectors (may be
    empty).  ``compute(p0, p1, coeff_tiles) -> (out0, out1)``.
    """
    m = block.shape[0] // 2
    if m % TILE != 0:
        raise ValueError(f"half size {m} not a multiple of {TILE}")
    rows = m // LANES
    if rows % chunk_rows != 0:
        # flooring nchunks would leave the output tail unwritten -- make
        # a bad direct chunk_rows loud instead of returning garbage
        raise ValueError(
            f"chunk_rows {chunk_rows} does not divide {rows} rows"
        )
    nchunks = rows // chunk_rows
    nstreams = len(coeffs)
    v = block.reshape(2, rows, LANES)
    cs = [c.reshape(rows, LANES).astype(block.dtype) for c in coeffs]

    buf = lambda: pltpu.VMEM((2, chunk_rows, LANES), block.dtype)
    out = pl.pallas_call(
        partial(
            _protocol_kernel, dev_bit, axis_name, nchunks, chunk_rows,
            nstreams, compute,
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (1 + nstreams),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((2, rows, LANES), block.dtype),
        scratch_shapes=(
            [buf(), buf()]                      # recv, keep
            + [buf() for _ in range(nstreams)]  # coefficient tiles
            + [pltpu.VMEM((2, 2, chunk_rows, LANES), block.dtype)]  # out
            + [pltpu.SemaphoreType.DMA((2,))] * (3 + nstreams)
            + [pltpu.SemaphoreType.DMA((2, 2))]  # out
            + [pltpu.SemaphoreType.REGULAR]      # capacity
        ),
        compiler_params=pltpu.CompilerParams(
            collective_id=_COLLECTIVE_ID, has_side_effects=True
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(v, *cs)
    return out.reshape(-1)


def _rotate_2x2(p0, p1, coeffs):
    c, s = coeffs
    return c * p0 - s * p1, s * p0 + c * p1


def _hadamard_2x2(p0, p1, coeffs):
    r = jnp.asarray(np.sqrt(0.5), dtype=p0.dtype)
    return (p0 + p1) * r, (p0 - p1) * r


# Interpret-mode ceiling for the fused kernels' local block.  TPU interpret
# mode runs every device's kernel as a host thread whose DMA/semaphore waits
# block; on this image's SINGLE CPU core the scheduler stops making progress
# for larger blocks (empirically: q_local <= 12 always completes, q_local >=
# 13 can wedge in _allocate_buffer regardless of chunking).  Real-TPU
# execution (interpret=False) has no such limit -- the kernels are written
# for arbitrary block sizes and chunk by CHUNK_ROWS.
INTERPRET_MAX_BLOCK = 4096


def ucry_exchange_eligible(block_size: int, interpret: bool = False) -> bool:
    """The fused kernels need tile-aligned halves (M = block/2); under
    interpret mode the block must also fit the single-core scheduling
    ceiling (see ``INTERPRET_MAX_BLOCK``)."""
    if interpret and block_size > INTERPRET_MAX_BLOCK:
        return False
    return block_size >= 2 * TILE and (block_size // 2) % TILE == 0


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def ucry_exchange_fused_rdma(
    block: jax.Array,
    cos_half: jax.Array,
    sin_half: jax.Array,
    dev_bit: int,
    axis_name: str,
    n_dev: int,
    interpret: bool = False,
) -> jax.Array:
    """Exchange global qubit ``dev_bit`` with the local MSB and apply the
    multiplexed Ry targeting it, in one comm-overlapped kernel.

    ``block``: this device's flat [2^q_local] real slice (halves indexed by
    the local MSB).  ``cos_half``/``sin_half``: [2^(q_local-1)] per-device
    rotation coefficients (global control axes already selected by device
    bits, exactly as ``sim.sharded._select_global_control_angles`` emits).
    Must be called inside ``shard_map`` with ``axis_name`` in scope, by
    every device (all devices pair up across ``dev_bit``).

    Returns the rotated block in post-exchange layout: local MSB = the
    (previously global) rotation target; the old local-MSB qubit now lives
    at global position ``dev_bit`` -- the caller's layout tracker records
    the swap.

    Differentiable in all three array arguments (custom VJP: pallas_call
    carries no autodiff rule): the block cotangent is the inverse rotation
    followed by the adjoint exchange (the exchange permutation is an
    involution, realized with the collective path -- the backward pass
    trades the RDMA overlap for simplicity), and the cos/sin cotangents are
    elementwise products against the post-exchange inputs recovered by
    inverse-rotating the saved outputs.
    """
    return _rdma_impl(block, cos_half, sin_half, dev_bit, axis_name, n_dev,
                      interpret)


def _rdma_fwd(block, cos_half, sin_half, dev_bit, axis_name, n_dev, interpret):
    out = _rdma_impl(
        block, cos_half, sin_half, dev_bit, axis_name, n_dev, interpret
    )
    return out, (out, cos_half, sin_half)


def _rdma_bwd(dev_bit, axis_name, n_dev, interpret, res, g):
    from qkan_implementation_tpu.sim.sharded import _exchange_global_local

    out, c, s = res
    m = c.shape[0]
    q_local = int(np.log2(2 * m))
    o0, o1 = out[:m], out[m:]
    g0, g1 = g[:m], g[m:]
    # post-exchange inputs recovered by the inverse rotation of the outputs
    p0 = c * o0 + s * o1
    p1 = -s * o0 + c * o1
    dc = g0 * p0 + g1 * p1
    ds = g1 * p0 - g0 * p1
    # R^T g, then the adjoint exchange (involution) back to pre-exchange
    dpost = jnp.concatenate([c * g0 + s * g1, -s * g0 + c * g1])
    dpre = _exchange_global_local(
        dpost, dev_bit, q_local - 1, axis_name, n_dev
    )
    return dpre, dc.astype(c.dtype), ds.astype(s.dtype)


ucry_exchange_fused_rdma.defvjp(_rdma_fwd, _rdma_bwd)


def _rdma_impl(block, cos_half, sin_half, dev_bit, axis_name, n_dev,
               interpret=False):
    m = cos_half.shape[0]
    if block.shape[0] != 2 * m:
        raise ValueError(
            f"block {block.shape[0]} does not match 2x{m} angles"
        )
    # chunk_rows derives from the CHUNK_ROWS module global OUTSIDE the jit
    # boundary and rides in as a static arg, so the jit cache key is honest
    # when CHUNK_ROWS is changed (e.g. the multi-chunk protocol tests).
    chunk_rows = _chunk_rows_for(m // LANES)
    return _rdma_call(
        block, cos_half, sin_half, dev_bit, axis_name, n_dev, interpret,
        chunk_rows,
    )


@partial(
    jax.jit,
    static_argnames=(
        "dev_bit", "axis_name", "n_dev", "interpret", "chunk_rows"
    ),
)
def _rdma_call(
    block: jax.Array,
    cos_half: jax.Array,
    sin_half: jax.Array,
    dev_bit: int,
    axis_name: str,
    n_dev: int,
    interpret: bool,
    chunk_rows: int,
) -> jax.Array:
    return _launch(
        block, (cos_half, sin_half), dev_bit, axis_name, chunk_rows,
        _rotate_2x2, interpret,
    )


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def h_exchange_fused_rdma(
    block: jax.Array,
    dev_bit: int,
    axis_name: str,
    n_dev: int,
    interpret: bool = False,
) -> jax.Array:
    """Exchange global qubit ``dev_bit`` with the local MSB and apply a
    Hadamard to it in one comm-overlapped kernel (the global-H analog of
    ``ucry_exchange_fused_rdma``; reference H walls:
    ``QKAN_Steps_original/MulStep.py:115-166`` FABLE structure).

    Returns the block in post-exchange layout (local MSB = the previously
    global target); the caller's layout tracker records the swap.
    Differentiable in ``block``: H and the exchange permutation are both
    real involutions, so the cotangent is H on the post-exchange halves
    followed by the adjoint exchange (collective path)."""
    return _h_impl(block, dev_bit, axis_name, n_dev, interpret)


def _h_fwd(block, dev_bit, axis_name, n_dev, interpret):
    return _h_impl(block, dev_bit, axis_name, n_dev, interpret), None


def _h_bwd(dev_bit, axis_name, n_dev, interpret, res, g):
    from qkan_implementation_tpu.sim.sharded import _exchange_global_local

    del res
    m = g.shape[0] // 2
    q_local = int(np.log2(2 * m))
    g0, g1 = g[:m], g[m:]
    r = jnp.asarray(np.sqrt(0.5), dtype=g.dtype)
    hg = jnp.concatenate([(g0 + g1) * r, (g0 - g1) * r])
    return (
        _exchange_global_local(
            hg, dev_bit, q_local - 1, axis_name, n_dev
        ),
    )


h_exchange_fused_rdma.defvjp(_h_fwd, _h_bwd)


def _h_impl(block, dev_bit, axis_name, n_dev, interpret=False):
    chunk_rows = _chunk_rows_for(block.shape[0] // 2 // LANES)
    return _h_call(block, dev_bit, axis_name, n_dev, interpret, chunk_rows)


@partial(
    jax.jit,
    static_argnames=(
        "dev_bit", "axis_name", "n_dev", "interpret", "chunk_rows"
    ),
)
def _h_call(
    block: jax.Array,
    dev_bit: int,
    axis_name: str,
    n_dev: int,
    interpret: bool,
    chunk_rows: int,
) -> jax.Array:
    return _launch(
        block, (), dev_bit, axis_name, chunk_rows, _hadamard_2x2, interpret
    )
