"""Register-fusion pass: H-walls and swap-runs vs the unfused engine."""

import numpy as np
import jax
import jax.numpy as jnp

from qkan_implementation_tpu.encoding import fable
from qkan_implementation_tpu.sim import Circuit, simulate, unitary
from qkan_implementation_tpu.sim.fusion import (
    BitPermutation,
    HRegister,
    fuse_register_ops,
)


def _rand_state(q, seed=0):
    rng = np.random.default_rng(seed)
    psi = rng.normal(size=2**q)
    return jnp.asarray(psi / np.linalg.norm(psi))


def test_fable_fused_circuit_collapses_to_pseudo_ops():
    rng = np.random.default_rng(1)
    circ, _ = fable(rng.uniform(-1, 1, (8, 8)))  # 7 qubits
    items = fuse_register_ops(circ.gates, circ.num_qubits)
    kinds = [type(i).__name__ for i in items]
    # H wall, ucry, swap run, H wall -> 4 items
    assert kinds.count("HRegister") == 2
    assert kinds.count("BitPermutation") == 1
    assert len(items) == 4, kinds


def test_auto_backend_matches_xla_on_fable():
    rng = np.random.default_rng(2)
    a = rng.uniform(-1, 1, (8, 8))
    circ, alpha = fable(a)
    psi0 = _rand_state(circ.num_qubits, 3)
    want = np.asarray(simulate(circ, psi0=psi0, backend="xla"))
    got = np.asarray(simulate(circ, psi0=psi0, backend="auto"))
    np.testing.assert_allclose(got, want, atol=1e-12)
    # block contract still holds end to end through the fused path
    u_col0 = np.asarray(simulate(circ, backend="auto"))
    np.testing.assert_allclose(u_col0[:8] * alpha * 8, a[:, 0], atol=1e-8)


def test_auto_backend_matches_xla_on_random_mixed_circuit():
    rng = np.random.default_rng(4)
    q = 9
    circ = Circuit(q)
    for t in range(q):
        circ.h(t)  # H wall
    circ.swap(0, 5).swap(1, 6).swap(2, 7)  # swap run
    circ.cry(0.7, 3, 8)
    circ.h(2).h(2)  # duplicate qubit breaks the run (two walls of 1)
    circ.ry(0.3, 4)
    for t in (1, 3, 5):
        circ.h(t)
    psi0 = _rand_state(q, 5)
    want = np.asarray(simulate(circ, psi0=psi0, backend="xla"))
    got = np.asarray(simulate(circ, psi0=psi0, backend="auto"))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_unitary_through_fused_path_stays_unitary():
    rng = np.random.default_rng(6)
    d = rng.uniform(-1, 1, 8)
    circ, alpha = fable(np.diag(d))
    u = np.asarray(unitary(circ))
    np.testing.assert_allclose(u @ u.T, np.eye(u.shape[0]), atol=1e-9)
    # unitarity alone passes for ANY permutation/misapplied-gate bug in the
    # fusion pass; the block-encoding contract pins the actual values
    np.testing.assert_allclose(
        u[:8, :8] * alpha * 8, np.diag(d), atol=1e-9
    )


def test_noncontiguous_h_register_segments():
    q = 14  # force the segment cap path too (>10 contiguous)
    circ = Circuit(q)
    for t in range(q):
        circ.h(t)
    psi0 = _rand_state(q, 7)
    want = np.asarray(simulate(circ, psi0=psi0, backend="xla"))
    got = np.asarray(simulate(circ, psi0=psi0, backend="auto"))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_runtime_fable_executor_matches_circuit():
    from qkan_implementation_tpu.encoding.fable import fable_runtime_params
    from qkan_implementation_tpu.sim.fusion import simulate_fable_runtime

    rng = np.random.default_rng(9)
    a = rng.uniform(-1, 1, (8, 8))
    circ, alpha = fable(a)
    cs, sn, alpha2, n = fable_runtime_params(a)
    assert alpha2 == alpha and n == 3
    psi0 = _rand_state(circ.num_qubits, 10)
    want = np.asarray(simulate(circ, psi0=psi0, backend="xla"))
    # params as TRACED jit arguments (the whole point)
    f = jax.jit(
        lambda c, s, p: simulate_fable_runtime(c, s, n, psi0=p)
    )
    got = np.asarray(f(jnp.asarray(cs), jnp.asarray(sn), psi0))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_runtime_fable_executor_differentiable():
    from qkan_implementation_tpu.encoding.fable import fable_runtime_params
    from qkan_implementation_tpu.sim.fusion import simulate_fable_runtime

    rng = np.random.default_rng(11)
    a = np.diag(rng.uniform(-0.9, 0.9, 8))
    cs, sn, alpha, n = fable_runtime_params(a)

    def loss(cs, sn):
        psi = simulate_fable_runtime(jnp.asarray(cs), jnp.asarray(sn), n)
        # full-state, asymmetric loss: the top-block-only quadratic has an
        # exactly-zero sn gradient at the FABLE point (FD-verified), which
        # would make the sn checks vacuous; psi**3 over the whole state
        # exercises both operands and catches transposed cotangents
        return jnp.sum(psi**3)

    g_cs, g_sn = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(cs), jnp.asarray(sn)
    )
    assert np.any(np.abs(np.asarray(g_cs)) > 1e-8)
    assert np.any(np.abs(np.asarray(g_sn)) > 1e-8)
    assert np.all(np.isfinite(np.asarray(g_cs)))
    assert np.all(np.isfinite(np.asarray(g_sn)))

    # FINITE-DIFFERENCE spot checks: finiteness alone passes for a wrong
    # VJP (sign flip, factor, transposed indexing).  Central differences on
    # a few coefficients of each operand pin the actual values.
    eps = 1e-6
    cs0, sn0 = np.asarray(cs, dtype=np.float64), np.asarray(sn, dtype=np.float64)
    for arr, grad, which in ((cs0, g_cs, 0), (sn0, g_sn, 1)):
        flat = arr.reshape(-1)
        for idx in (0, len(flat) // 2, len(flat) - 1):
            up, dn = flat.copy(), flat.copy()
            up[idx] += eps
            dn[idx] -= eps
            args_u = [cs0, sn0]
            args_d = [cs0, sn0]
            args_u[which] = up.reshape(arr.shape)
            args_d[which] = dn.reshape(arr.shape)
            fd = (
                float(loss(jnp.asarray(args_u[0]), jnp.asarray(args_u[1])))
                - float(loss(jnp.asarray(args_d[0]), jnp.asarray(args_d[1])))
            ) / (2 * eps)
            np.testing.assert_allclose(
                np.asarray(grad).reshape(-1)[idx], fd, rtol=1e-5, atol=1e-8
            )
