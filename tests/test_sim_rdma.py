"""Fused RDMA exchange+ucry kernel vs the collective two-step path.

``sim.rdma`` collapses the qubit-localizing exchange and the multiplexed-Ry
rotation into one double-buffered Pallas kernel (remote DMAs + semaphores),
run here under Pallas TPU interpret mode on the 8-virtual-device CPU mesh --
which simulates the inter-device DMAs, capacity credits, and barriers the
real ICI path uses.  Physics contract: bit-identical to the dense engine
(reference semantics ``QKAN_Steps_original/MulStep.py:115-166``).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import qkan_implementation_tpu.sim.rdma as rdma_mod
from qkan_implementation_tpu.parallel import make_mesh
from qkan_implementation_tpu.sim import Circuit, simulate
from qkan_implementation_tpu.sim.rdma import ucry_exchange_fused_rdma
from qkan_implementation_tpu.sim.sharded import (
    _exchange_global_local,
    sharded_simulate,
)

AXIS = "d"
NDEV = 8


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8, axis_name=AXIS)


def _count_calls(monkeypatch, attr: str) -> list:
    """Spy on an rdma-module kernel: returns the list that records calls.

    The engine falls back to the collective path SILENTLY whenever
    eligibility fails, so every test claiming RDMA coverage must assert
    its kernel actually fired (or explicitly that it did not)."""
    fired = []
    orig = getattr(rdma_mod, attr)

    def counting(*a, **k):
        fired.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(rdma_mod, attr, counting)
    return fired


def _run_pair(mesh, q_local, dev_bit, dtype=jnp.float64):
    """Fused kernel vs collective-exchange + elementwise rotation."""
    m = 2 ** (q_local - 1)
    rng = np.random.default_rng(q_local * 10 + dev_bit)
    full = jnp.asarray(rng.standard_normal(NDEV * 2 * m), dtype=dtype)
    thetas = jnp.asarray(rng.standard_normal(NDEV * m), dtype=dtype)
    xs = jax.device_put(full, NamedSharding(mesh, P(AXIS)))
    th = jax.device_put(thetas, NamedSharding(mesh, P(AXIS)))

    def fused(block, t):
        return ucry_exchange_fused_rdma(
            block,
            jnp.cos(t / 2).astype(block.dtype),
            jnp.sin(t / 2).astype(block.dtype),
            dev_bit,
            AXIS,
            NDEV,
            interpret=True,
        )

    def two_step(block, t):
        psi = _exchange_global_local(
            block, dev_bit, q_local - 1, AXIS, NDEV, q_local
        )
        v = psi.reshape(2, m)
        c = jnp.cos(t / 2).astype(block.dtype)
        s = jnp.sin(t / 2).astype(block.dtype)
        return jnp.stack([c * v[0] - s * v[1], s * v[0] + c * v[1]]).reshape(-1)

    f1 = jax.jit(
        jax.shard_map(
            fused, mesh=mesh, in_specs=(P(AXIS), P(AXIS)),
            out_specs=P(AXIS), check_vma=False,
        )
    )
    f2 = jax.jit(
        jax.shard_map(
            two_step, mesh=mesh, in_specs=(P(AXIS), P(AXIS)),
            out_specs=P(AXIS), check_vma=False,
        )
    )
    np.testing.assert_array_equal(np.asarray(f1(xs, th)), np.asarray(f2(xs, th)))


@pytest.mark.parametrize("dev_bit", [0, 1, 2])
def test_kernel_matches_collective_single_chunk(mesh8, dev_bit):
    _run_pair(mesh8, q_local=11, dev_bit=dev_bit)


@pytest.mark.parametrize("dev_bit", [0, 2])
def test_kernel_matches_collective_multi_chunk(mesh8, dev_bit, monkeypatch):
    # Shrink the chunk so the double-buffered capacity protocol runs 4
    # deep -- at q_local=12 (block 4096), inside the single-core interpret
    # envelope (rdma.INTERPRET_MAX_BLOCK documents q_local >= 13 as a
    # nondeterministic scheduler wedge on this image).
    monkeypatch.setattr(rdma_mod, "CHUNK_ROWS", 4)
    _run_pair(mesh8, q_local=12, dev_bit=dev_bit)


def test_fable_circuit_rdma_matches_dense(mesh8, monkeypatch):
    """Full FABLE block encoding with the fused-RDMA exchange: the fused
    ucry targets the top (global) qubit, so the RDMA path carries the whole
    encoding's communication -- and must actually FIRE (the engine falls
    back silently; q_local=12 sits exactly on the interpret block
    ceiling)."""
    from qkan_implementation_tpu.encoding.fable import fable

    fired = _count_calls(monkeypatch, "ucry_exchange_fused_rdma")
    rng = np.random.default_rng(7)
    a = rng.standard_normal((128, 128))
    a /= np.max(np.abs(a))
    circ, _ = fable(a)
    assert circ.num_qubits == 15  # q_local = 12: kernel-eligible
    dense = np.asarray(simulate(circ))
    shard = np.asarray(
        jax.device_get(
            sharded_simulate(circ, mesh8, exchange_impl="rdma")
        )
    )
    assert fired, "fused RDMA ucry did not fire"
    np.testing.assert_allclose(shard, dense, atol=1e-12)


def test_rdma_engine_matches_collective_engine(mesh8, monkeypatch):
    from qkan_implementation_tpu.encoding.fable import fable

    fired = _count_calls(monkeypatch, "ucry_exchange_fused_rdma")
    rng = np.random.default_rng(11)
    a = rng.standard_normal((128, 128))
    a /= np.max(np.abs(a))
    circ, _ = fable(a)
    ref = np.asarray(
        jax.device_get(sharded_simulate(circ, mesh8, exchange_impl="collective"))
    )
    out = np.asarray(
        jax.device_get(sharded_simulate(circ, mesh8, exchange_impl="rdma"))
    )
    assert fired, "fused RDMA ucry did not fire"
    np.testing.assert_allclose(out, ref, atol=1e-13)


def test_rdma_falls_back_below_tile(mesh8, monkeypatch):
    """Small circuits (half-block under one tile) must use the collective
    path (negative firing assertion) and still match dense."""
    from qkan_implementation_tpu.encoding.fable import fable

    fired = _count_calls(monkeypatch, "ucry_exchange_fused_rdma")
    rng = np.random.default_rng(3)
    a = rng.standard_normal((8, 8))
    a /= np.max(np.abs(a))
    circ, _ = fable(a)
    dense = np.asarray(simulate(circ))
    shard = np.asarray(
        jax.device_get(sharded_simulate(circ, mesh8, exchange_impl="rdma"))
    )
    assert not fired, "fused kernel fired below the tile floor"
    np.testing.assert_allclose(shard, dense, atol=1e-12)


def test_rdma_kernel_gradients_match_collective(mesh8):
    """The custom VJP: grads through the fused kernel must equal grads
    through the collective exchange + elementwise rotation."""
    q_local, dev_bit = 11, 1
    m = 2 ** (q_local - 1)
    rng = np.random.default_rng(2)
    full = jnp.asarray(rng.standard_normal(NDEV * 2 * m))
    thetas = jnp.asarray(rng.standard_normal(NDEV * m))
    xs = jax.device_put(full, NamedSharding(mesh8, P(AXIS)))
    th = jax.device_put(thetas, NamedSharding(mesh8, P(AXIS)))

    def fused(block, t):
        return ucry_exchange_fused_rdma(
            block, jnp.cos(t / 2), jnp.sin(t / 2), dev_bit, AXIS, NDEV,
            True,
        )

    def two_step(block, t):
        psi = _exchange_global_local(
            block, dev_bit, q_local - 1, AXIS, NDEV, q_local
        )
        v = psi.reshape(2, m)
        c, s = jnp.cos(t / 2), jnp.sin(t / 2)
        return jnp.stack(
            [c * v[0] - s * v[1], s * v[0] + c * v[1]]
        ).reshape(-1)

    def make_loss(f):
        def loss(block, t):
            out = f(block, t)
            return jnp.sum(out**3)  # asymmetric: catches transpose errors

        return jax.jit(
            jax.shard_map(
                jax.grad(loss, argnums=(0, 1)),
                mesh=mesh8,
                in_specs=(P(AXIS), P(AXIS)),
                out_specs=(P(AXIS), P(AXIS)),
                check_vma=False,
            )
        )

    g1b, g1t = make_loss(fused)(xs, th)
    g2b, g2t = make_loss(two_step)(xs, th)
    np.testing.assert_allclose(
        np.asarray(g1b), np.asarray(g2b), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(g1t), np.asarray(g2t), atol=1e-12
    )


def test_quantum_sharded_grad_through_rdma(mesh8, monkeypatch):
    """Quantum-mode gradient with exchange_impl='rdma': the packed
    extraction's circuit must produce the same weight gradients through the
    RDMA engine as through the collective engine.  The fused kernel must
    actually FIRE (asserted via a counting wrapper): the circuit's H walls
    scramble the layout before the big ucry, so this exercises the
    partial-control angle broadcast too."""
    from qkan_implementation_tpu.ops.quantum import (
        quantum_extract_diag_packed_sharded,
    )

    fired = _count_calls(monkeypatch, "ucry_exchange_fused_rdma")

    rng = np.random.default_rng(5)
    # diag of 128 -> 15-qubit circuit, q_local=12 (m=2048, tile-aligned and
    # within the interpret-mode block ceiling; see rdma.INTERPRET_MAX_BLOCK)
    diag = jnp.asarray(rng.uniform(-0.9, 0.9, 128))

    def loss(d, impl):
        rec = quantum_extract_diag_packed_sharded(d, mesh8, exchange_impl=impl)
        return jnp.sum(rec**3)

    g_col = jax.grad(lambda d: loss(d, "collective"))(diag)
    g_rdma = jax.grad(lambda d: loss(d, "rdma"))(diag)
    assert fired, "fused RDMA kernel did not fire for the quantum circuit"
    np.testing.assert_allclose(
        np.asarray(g_rdma), np.asarray(g_col), atol=1e-10
    )


def test_rdma_partial_control_register(mesh8, monkeypatch):
    """Generalized eligibility: a global-target ucry whose controls are an
    arbitrary (partial, unordered) qubit subset fuses via the angle
    broadcast (sim.sharded._broadcast_local_angles) and must match dense.
    The second ucry targets a DIFFERENT still-global qubit with a control
    that became global after the first fusion's eviction -- exercising the
    device-bit angle selection INSIDE the fused branch (the first fusion
    parks the original target at the local MSB, so re-targeting it would
    take the plain local path and leave that branch untested)."""
    q = 14  # q_local = 11 on the 8-device mesh
    fired = _count_calls(monkeypatch, "ucry_exchange_fused_rdma")
    rng = np.random.default_rng(17)
    circ = Circuit(q)
    circ.h(2).h(5)
    # 3 scattered controls (8 angles), target = top (global) qubit
    circ.ucry(
        rng.uniform(-np.pi, np.pi, 8), controls=(7, 2, 4), target=q - 1
    )
    circ.h(0)
    # after the first fusion logical 10 was evicted to a device slot:
    # a fused ucry on the still-global q-2 with that GLOBAL control
    circ.ucry(
        rng.uniform(-np.pi, np.pi, 4), controls=(10, 3), target=q - 2
    )
    dense = np.asarray(simulate(circ))
    shard = np.asarray(
        jax.device_get(sharded_simulate(circ, mesh8, exchange_impl="rdma"))
    )
    assert len(fired) == 2, f"expected 2 fused ucry calls, got {len(fired)}"
    np.testing.assert_allclose(shard, dense, atol=1e-12)
    col = np.asarray(
        jax.device_get(
            sharded_simulate(circ, mesh8, exchange_impl="collective")
        )
    )
    np.testing.assert_allclose(shard, col, atol=1e-12)


def test_fused_h_exchange_matches_dense(mesh8, monkeypatch):
    """Global-qubit Hadamards fuse exchange+H into one RDMA kernel
    (sim.rdma.h_exchange_fused_rdma) on both the lone-H and H-wall paths,
    including the wall case where fusing one global H evicts a pending
    local-MSB wall qubit to global (the termination loop).  Must match the
    dense and collective engines exactly."""
    fired = _count_calls(monkeypatch, "h_exchange_fused_rdma")

    q = 14  # q_local = 11 on the 8-device mesh
    rng = np.random.default_rng(23)
    circ = Circuit(q)
    circ.h(q - 1)  # lone global H (the ucry below breaks the wall run)
    circ.ucry(rng.uniform(-np.pi, np.pi, 2), controls=(0,), target=1)
    # wall: global q-2, local MSB (evicted by the first fusion), local 2
    circ.h(q - 2).h(10).h(2)
    circ.ucry(rng.uniform(-np.pi, np.pi, 4), controls=(3, 5), target=q - 1)

    dense = np.asarray(simulate(circ))
    shard = np.asarray(
        jax.device_get(sharded_simulate(circ, mesh8, exchange_impl="rdma"))
    )
    assert len(fired) == 3, f"expected 3 fused-H calls, got {len(fired)}"
    np.testing.assert_allclose(shard, dense, atol=1e-12)
    col = np.asarray(
        jax.device_get(
            sharded_simulate(circ, mesh8, exchange_impl="collective")
        )
    )
    np.testing.assert_allclose(shard, col, atol=1e-12)

    # LOCALS-FIRST schedule (review r3): the wall's local members (10 =
    # local MSB, 2) finish in one register contraction BEFORE the fused
    # pass for global member 12, so the eviction hits an already-done
    # qubit -- ONE fused call where the old schedule paid two (fusing 12
    # first evicted the still-pending 10 to global)
    del fired[:]
    c2 = Circuit(q)
    c2.ry(0.3, 0)
    c2.h(12).h(10).h(2)
    dense2 = np.asarray(simulate(c2))
    shard2 = np.asarray(
        jax.device_get(sharded_simulate(c2, mesh8, exchange_impl="rdma"))
    )
    assert len(fired) == 1, f"expected 1 fused-H call, got {len(fired)}"
    np.testing.assert_allclose(shard2, dense2, atol=1e-12)


def test_fused_h_gradient_matches_collective(mesh8, monkeypatch):
    """d(loss)/d(psi0) through the fused H kernel's custom VJP equals the
    collective path's gradient."""
    fired = _count_calls(monkeypatch, "h_exchange_fused_rdma")

    q = 14  # q_local = 11: block 2048 = 2*TILE, kernel-eligible
    rng = np.random.default_rng(29)
    circ = Circuit(q)
    circ.h(q - 1).h(4)  # wall with one global member
    circ.ucry(rng.uniform(-np.pi, np.pi, 2), controls=(1,), target=0)
    circ.h(q - 2)  # lone global H

    psi0 = jnp.asarray(rng.standard_normal(2**q))
    psi0 = psi0 / jnp.linalg.norm(psi0)

    def loss(p, impl):
        out = sharded_simulate(
            circ, mesh8, psi0=p, dtype=p.dtype, exchange_impl=impl
        )
        return jnp.sum(out**3)

    g_rdma = jax.grad(lambda p: loss(p, "rdma"))(psi0)
    assert fired, "fused H kernel did not fire"
    g_col = jax.grad(lambda p: loss(p, "collective"))(psi0)
    np.testing.assert_allclose(
        np.asarray(g_rdma), np.asarray(g_col), atol=1e-10
    )
