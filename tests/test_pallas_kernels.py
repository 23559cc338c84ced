"""Pallas kernel tests (interpret mode on CPU) against the XLA engine."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qkan_implementation_tpu.sim import Circuit, simulate
from qkan_implementation_tpu.sim.pallas_kernels import (
    TILE,
    diag_mult_pallas,
    h_gate_pallas,
    simulate_fable_pallas,
    ucry_msb_pallas,
)


def test_ucry_msb_matches_xla():
    rng = np.random.default_rng(0)
    q = 11  # M = 2^10 = 1024 = one tile
    dim = 2**q
    psi = jnp.asarray(rng.normal(size=dim), dtype=jnp.float32)
    psi = psi / jnp.linalg.norm(psi)
    thetas = rng.uniform(-np.pi, np.pi, dim // 2)

    circ = Circuit(q).ucry(thetas, tuple(range(q - 2, -1, -1)), q - 1)
    expected = simulate(circ, psi0=psi, dtype=jnp.float32)
    got = ucry_msb_pallas(psi, jnp.asarray(thetas, dtype=jnp.float32), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-6)


def test_diag_mult_matches_xla():
    rng = np.random.default_rng(1)
    n = 2 * TILE
    psi = jnp.asarray(rng.normal(size=n), dtype=jnp.float32)
    diag = jnp.asarray(rng.uniform(-1, 1, n), dtype=jnp.float32)
    got = diag_mult_pallas(psi, diag, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(psi * diag), atol=1e-6)


@pytest.mark.parametrize("qubit", [7, 9, 10])
def test_h_gate_matches_xla(qubit):
    rng = np.random.default_rng(2)
    q = 11
    dim = 2**q
    psi = jnp.asarray(rng.normal(size=dim), dtype=jnp.float32)
    psi = psi / jnp.linalg.norm(psi)
    expected = simulate(Circuit(q).h(qubit), psi0=psi, dtype=jnp.float32)
    got = h_gate_pallas(psi, qubit, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-6)


def test_fable_simulation_pallas_end_to_end():
    # 32x32 block -> n=5 -> 11-qubit circuit; ucry target is qubit 10 (MSB)
    rng = np.random.default_rng(3)
    a = rng.uniform(-1, 1, (32, 32))
    psi, alpha = simulate_fable_pallas(a, interpret=True)
    # first column of the block encoding = a[:, 0] / (alpha * 32)
    expected_col = a[:, 0] / (alpha * 32)
    np.testing.assert_allclose(
        np.asarray(psi)[:32], expected_col, atol=1e-5
    )
    np.testing.assert_allclose(
        float(jnp.linalg.norm(psi)), 1.0, atol=1e-5
    )
    # FULL-STATE oracle: norm + 32 amplitudes pass for any norm-preserving
    # corruption of the other 2016 amplitudes (e.g. a wrong permutation
    # outside the block region)
    from qkan_implementation_tpu.encoding import fable
    from qkan_implementation_tpu.sim import simulate

    circ, _ = fable(a)
    ref = np.asarray(simulate(circ, backend="xla", dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(psi), ref, atol=1e-5)


def test_tile_size_validation():
    psi = jnp.zeros(64, dtype=jnp.float32)
    with pytest.raises(ValueError):
        ucry_msb_pallas(psi, jnp.zeros(32), interpret=True)


def test_ucry_cs_variant_matches():
    from qkan_implementation_tpu.sim.pallas_kernels import ucry_msb_cs_pallas

    rng = np.random.default_rng(9)
    q = 11
    dim = 2**q
    psi = jnp.asarray(rng.normal(size=dim), dtype=jnp.float32)
    psi = psi / jnp.linalg.norm(psi)
    thetas = rng.uniform(-np.pi, np.pi, dim // 2)
    expected = ucry_msb_pallas(
        psi, jnp.asarray(thetas, dtype=jnp.float32), interpret=True
    )
    got = ucry_msb_cs_pallas(
        psi,
        jnp.asarray(np.cos(thetas / 2), dtype=jnp.float32),
        jnp.asarray(np.sin(thetas / 2), dtype=jnp.float32),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-6)


def test_simulate_auto_uses_cs_path_for_static_fable(monkeypatch):
    # simulate(backend='pallas') on a static-angle FABLE circuit routes the
    # ucry through the precomputed-trig kernel; result must match XLA, and
    # the kernel must actually FIRE (any _pallas_eligible miss silently
    # falls back to apply_gate, making pallas == xla trivially true).
    import qkan_implementation_tpu.sim.pallas_kernels as pk
    from qkan_implementation_tpu.encoding import fable
    from qkan_implementation_tpu.sim import simulate

    fired = []
    orig = pk.ucry_msb_cs_pallas_pair

    def counting(*a, **k):
        fired.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(pk, "ucry_msb_cs_pallas_pair", counting)

    rng = np.random.default_rng(10)
    a = rng.uniform(-1, 1, (32, 32))  # 11-qubit circuit, M=1024 = one tile
    circ, alpha = fable(a)
    xla = np.asarray(simulate(circ, backend="xla", dtype=jnp.float32))
    pallas = np.asarray(simulate(circ, backend="pallas", dtype=jnp.float32))
    assert fired, "CS Pallas kernel did not fire under backend='pallas'"
    np.testing.assert_allclose(pallas, xla, atol=1e-5)


def test_ucry_pair_matches_flat_and_xla():
    # the sliceless pair variant must agree with the flat-slice kernel and
    # the XLA lowering (it is simulate()'s static-angle fast path on TPU)
    from qkan_implementation_tpu.sim.pallas_kernels import (
        ucry_msb_cs_pallas,
        ucry_msb_cs_pallas_pair,
    )
    from qkan_implementation_tpu.sim.statevector import _apply_ucry

    rng = np.random.default_rng(3)
    q = 12
    dim = 2**q
    psi = jnp.asarray(rng.normal(size=dim), dtype=jnp.float32)
    psi = psi / jnp.linalg.norm(psi)
    thetas = rng.uniform(-np.pi, np.pi, dim // 2)
    cs = jnp.asarray(np.cos(thetas / 2), dtype=jnp.float32)
    sn = jnp.asarray(np.sin(thetas / 2), dtype=jnp.float32)

    want = np.asarray(
        _apply_ucry(
            psi, jnp.asarray(thetas), q - 1, tuple(range(q - 2, -1, -1)), q
        )
    )
    flat = np.asarray(ucry_msb_cs_pallas(psi, cs, sn, interpret=True))
    pair = np.asarray(ucry_msb_cs_pallas_pair(psi, cs, sn, interpret=True))
    np.testing.assert_allclose(flat, want, atol=1e-6)
    np.testing.assert_allclose(pair, want, atol=1e-6)


def test_ucry_kernels_differentiable():
    # custom VJPs: gradients through the Pallas kernels must match the XLA
    # lowering (TPU quantum training routes traced-angle ucry through the
    # kernel; pallas_call has no autodiff rule of its own)
    from qkan_implementation_tpu.sim.pallas_kernels import (
        ucry_msb_cs_pallas_pair,
        ucry_msb_pallas,
    )
    from qkan_implementation_tpu.sim.statevector import _apply_ucry

    q = 11
    dim = 2**q
    rng = np.random.default_rng(5)
    psi = jnp.asarray(rng.normal(size=dim), dtype=jnp.float32)
    th = jnp.asarray(rng.uniform(-3, 3, dim // 2), dtype=jnp.float32)
    tgt = jnp.asarray(rng.normal(size=dim), dtype=jnp.float32)

    def loss_ref(psi, th):
        out = _apply_ucry(psi, th, q - 1, tuple(range(q - 2, -1, -1)), q)
        return jnp.sum((out - tgt) ** 2)

    def loss_trig(psi, th):
        return jnp.sum((ucry_msb_pallas(psi, th, True) - tgt) ** 2)

    def loss_pair(psi, th):
        return jnp.sum(
            (
                ucry_msb_cs_pallas_pair(
                    psi, jnp.cos(th / 2), jnp.sin(th / 2), True
                )
                - tgt
            )
            ** 2
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(psi, th)
    for loss in (loss_trig, loss_pair):
        g = jax.grad(loss, argnums=(0, 1))(psi, th)
        np.testing.assert_allclose(np.asarray(g[0]), np.asarray(g_ref[0]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(g[1]), np.asarray(g_ref[1]), atol=1e-5)


def test_multi_block_grid_path(monkeypatch):
    """Every default-size test collapses the pallas_call grid to one block
    (TILE=1024, BLOCK_ROWS=512 vs rows<=16), so BlockSpec index maps for
    i>0 never execute.  Shrinking BLOCK_ROWS forces a real multi-block
    grid through the ucry and H kernels under interpret mode."""
    import qkan_implementation_tpu.sim.pallas_kernels as pk
    from qkan_implementation_tpu.sim.pallas_kernels import (
        h_gate_pallas,
        ucry_msb_cs_pallas_pair,
    )
    from qkan_implementation_tpu.sim import Circuit, simulate

    monkeypatch.setattr(pk, "BLOCK_ROWS", 2)  # rows=16 -> grid of 8 blocks
    q = 12
    rng = np.random.default_rng(21)
    psi = jnp.asarray(rng.standard_normal(2**q), dtype=jnp.float32)
    psi = psi / jnp.linalg.norm(psi)
    thetas = rng.uniform(-np.pi, np.pi, 2 ** (q - 1))

    circ = Circuit(q)
    circ.ucry(thetas, tuple(range(q - 2, -1, -1)), q - 1)
    want = np.asarray(
        simulate(circ, psi0=psi, backend="xla", dtype=jnp.float32)
    )
    got = ucry_msb_cs_pallas_pair(
        psi,
        jnp.asarray(np.cos(thetas / 2), dtype=jnp.float32),
        jnp.asarray(np.sin(thetas / 2), dtype=jnp.float32),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    ch = Circuit(q)
    ch.h(q - 1)
    want_h = np.asarray(
        simulate(ch, psi0=psi, backend="xla", dtype=jnp.float32)
    )
    got_h = h_gate_pallas(psi, q - 1, interpret=True)
    np.testing.assert_allclose(np.asarray(got_h), want_h, atol=1e-6)
