"""Scan-fused ladder execution vs the unrolled engine."""

import time

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qkan_implementation_tpu.encoding import fable
from qkan_implementation_tpu.sim import Circuit, simulate
from qkan_implementation_tpu.sim.ladder import (
    LadderSegment,
    apply_ladder,
    fuse_ladders,
    simulate_fused,
)


def test_fuse_detects_fable_ladder():
    a = np.random.default_rng(0).uniform(-1, 1, (4, 4))
    circ, _ = fable(a, fused=False)
    items = fuse_ladders(circ, min_len=8)
    segments = [s for s in items if isinstance(s, LadderSegment)]
    assert len(segments) == 1
    # the ladder absorbed most of the gates
    plain = [g for g in items if not isinstance(g, LadderSegment)]
    assert len(plain) < len(circ.gates) / 4


@pytest.mark.parametrize("n", [1, 2, 3])
def test_fused_matches_unrolled_on_fable(n):
    rng = np.random.default_rng(n)
    a = rng.uniform(-1, 1, (2**n, 2**n))
    circ, alpha = fable(a, fused=False)
    dense = np.asarray(simulate(circ, backend="xla"))
    fused = np.asarray(simulate_fused(circ))
    np.testing.assert_allclose(fused, dense, atol=1e-10)
    # block contract still holds through the fused path
    np.testing.assert_allclose(
        fused[: 2**n] * alpha * 2**n, a[:, 0], atol=1e-8
    )


def test_fused_matches_on_random_ladder():
    rng = np.random.default_rng(5)
    q = 5
    t = 2
    circ = Circuit(q)
    circ.h(0).h(4)
    for _ in range(20):
        circ.ry(float(rng.uniform(-np.pi, np.pi)), t)
        circ.cx(int(rng.choice([0, 1, 3, 4])), t)
    circ.ry(0.3, t)  # trailing ry without cx
    circ.h(1)
    dense = np.asarray(simulate(circ, backend="xla"))
    fused = np.asarray(simulate_fused(circ))
    np.testing.assert_allclose(fused, dense, atol=1e-10)


def test_short_runs_stay_unfused():
    circ = Circuit(3).ry(0.1, 0).cx(1, 0).h(2)
    items = fuse_ladders(circ, min_len=8)
    assert all(not isinstance(i, LadderSegment) for i in items)


def test_large_elementary_fable_compiles_fast():
    # n=4 -> 9-qubit circuit with ~2*256 ladder gates; the fused path must
    # trace/compile in seconds where unrolling would take far longer.
    rng = np.random.default_rng(7)
    a = rng.uniform(-1, 1, (16, 16))
    circ, alpha = fable(a, fused=False)
    assert len(circ.gates) > 400
    f = jax.jit(lambda p: simulate_fused(circ, psi0=p))
    dim = 2**circ.num_qubits
    e0 = jnp.zeros(dim).at[0].set(1.0)
    start = time.time()
    psi = np.asarray(f(e0))
    compile_s = time.time() - start
    np.testing.assert_allclose(psi[:16] * alpha * 16, a[:, 0], atol=1e-8)
    assert compile_s < 60, compile_s


def test_simulate_auto_scan_fuses_long_ladders(monkeypatch):
    # VERDICT r1 item 9: simulate(backend='auto') must route elementary FABLE
    # ladders through the scan executor so compile time is O(1) in gate count.
    # The fusion pass is SPIED inside simulate() itself: re-running
    # fuse_ladders standalone would stay green even if the auto branch
    # dropped the call (correct amplitudes, superlinear compile regression).
    import qkan_implementation_tpu.sim.ladder as ladder_mod
    from qkan_implementation_tpu.sim.statevector import AUTO_LADDER_MIN

    fused_inside = []
    orig = ladder_mod.fuse_ladders

    def spy(circuit, min_len):
        items = orig(circuit, min_len=min_len)
        if any(isinstance(i, LadderSegment) for i in items):
            fused_inside.append(1)
        return items

    monkeypatch.setattr(ladder_mod, "fuse_ladders", spy)

    rng = np.random.default_rng(11)
    a = rng.uniform(-1, 1, (16, 16))
    circ, alpha = fable(a, fused=False)  # 9-qubit, ~520 gates
    assert len(circ.gates) > AUTO_LADDER_MIN
    auto = np.asarray(simulate(circ, backend="auto"))
    assert fused_inside, "backend='auto' did not scan-fuse the ladders"
    np.testing.assert_allclose(auto[:16] * alpha * 16, a[:, 0], atol=1e-8)


def test_fuse_skips_traced_angles():
    # Circuits with traced ry params (the differentiable quantum path) must
    # not be scan-fused: segments need static angle arrays.
    def build(theta):
        circ = Circuit(2)
        for _ in range(10):
            circ.ry(theta, 0)
            circ.cx(1, 0)
        return circ

    def traced_fn(theta):
        circ = build(theta)
        items = fuse_ladders(circ, min_len=4)
        assert all(not isinstance(i, LadderSegment) for i in items)
        return simulate(circ, backend="auto")

    out = jax.jit(traced_fn)(jnp.float64(0.3))
    # with a concrete angle the same circuit DOES fuse...
    circ = build(0.3)
    assert any(isinstance(i, LadderSegment) for i in fuse_ladders(circ, min_len=4))
    # ...and both paths agree
    want = simulate(circ, backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-12)
