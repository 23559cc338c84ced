"""Native C++ annealer tests: build, correctness vs brute force, and
agreement with the on-device JAX annealer."""

import numpy as np
import pytest

from qkan_implementation_tpu.anneal import QuboModel, degree_selection_qubo, solve_qubo
from qkan_implementation_tpu import native_bindings as nb

pytestmark = pytest.mark.skipif(
    not nb.native_available(), reason="no C++ toolchain"
)


def random_model(n=10, seed=0):
    rng = np.random.default_rng(seed)
    J = rng.normal(size=(n, n))
    J = (J + J.T) / 2
    np.fill_diagonal(J, 0.0)
    return QuboModel(h=rng.normal(size=n), J=J, offset=0.5)


def test_native_energies_match_python():
    model = random_model()
    rng = np.random.default_rng(1)
    samples = rng.integers(0, 2, (20, 10)).astype(np.float64)
    np.testing.assert_allclose(
        nb.energies_native(model, samples), model.energy(samples), atol=1e-10
    )


def test_native_brute_force_matches_python():
    model = random_model(n=8, seed=2)
    sample, e = nb.brute_force_native(model)
    # exhaustive python check
    best = np.inf
    for bits in range(2**8):
        s = np.array([(bits >> i) & 1 for i in range(8)], dtype=np.float64)
        best = min(best, model.energy(s))
    np.testing.assert_allclose(e, best, atol=1e-10)
    np.testing.assert_allclose(model.energy(sample), best, atol=1e-10)


def test_native_anneal_finds_optimum():
    model = random_model(n=12, seed=3)
    _, exact_e = nb.brute_force_native(model)
    samples, energies = nb.anneal_native(
        model, num_reads=200, num_sweeps=500, seed=0
    )
    np.testing.assert_allclose(energies.min(), exact_e, atol=1e-8)
    # reported energies are consistent with the samples
    np.testing.assert_allclose(
        energies, model.energy(samples), atol=1e-10
    )


def test_native_and_jax_annealers_agree():
    scores = np.array([0.8, 0.35, 0.3, 0.29])
    model = degree_selection_qubo(scores, num_functions=4, complexity_weight=0.1)
    _, jax_e = solve_qubo(
        model, num_reads=200, num_sweeps=500, seed=1, one_hot_block_size=4
    )
    _, native_energies = nb.anneal_native(
        model, num_reads=500, num_sweeps=1000, seed=1
    )
    np.testing.assert_allclose(native_energies.min(), jax_e, atol=1e-6)


def test_native_reproducible():
    model = random_model(n=6, seed=4)
    s1, e1 = nb.anneal_native(model, num_reads=16, num_sweeps=100, seed=9)
    s2, e2 = nb.anneal_native(model, num_reads=16, num_sweeps=100, seed=9)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(e1, e2)


def test_circuit_optimizer_cancels_and_merges():
    from qkan_implementation_tpu.sim import Circuit, unitary

    circ = Circuit(3)
    circ.h(0).h(0)              # cancels
    circ.ry(0.3, 1).ry(0.4, 1)  # merges to ry(0.7)
    circ.cx(0, 1).x(2).cx(0, 1) # cancels across the commuting x(2)
    circ.swap(1, 2).swap(2, 1)  # cancels (symmetric qubit order)
    circ.ry(0.5, 0).ry(-0.5, 0) # merges to zero -> dropped
    circ.rz(0.2, 2)

    opt = nb.optimize_circuit(circ)
    # survivors: merged ry(0.7) on q1, x(2), rz(0.2)
    names = [(g.name, g.qubits) for g in opt.gates]
    assert ("x", (2,)) in names and ("rz", (2,)) in names
    ry_gates = [g for g in opt.gates if g.name == "ry"]
    assert len(ry_gates) == 1
    np.testing.assert_allclose(ry_gates[0].params[0], 0.7, atol=1e-12)
    assert len(opt.gates) == 3

    u_before = np.asarray(unitary(circ))
    u_after = np.asarray(unitary(opt))
    np.testing.assert_allclose(u_after, u_before, atol=1e-10)


def test_circuit_optimizer_respects_blockers():
    from qkan_implementation_tpu.sim import Circuit, unitary

    circ = Circuit(2)
    circ.h(0).x(0).h(0)  # x(0) blocks the h-h cancellation
    opt = nb.optimize_circuit(circ)
    assert len(opt.gates) == 3
    np.testing.assert_allclose(
        np.asarray(unitary(opt)), np.asarray(unitary(circ)), atol=1e-12
    )


def test_circuit_optimizer_opaque_barrier():
    from qkan_implementation_tpu.sim import Circuit, unitary

    circ = Circuit(3)
    circ.h(2)
    circ.ucry([0.1, 0.2], controls=(0,), target=1)  # opaque
    circ.h(2)  # must NOT cancel across the opaque gate
    opt = nb.optimize_circuit(circ)
    assert len(opt.gates) == 3
    np.testing.assert_allclose(
        np.asarray(unitary(opt)), np.asarray(unitary(circ)), atol=1e-12
    )


def test_optimizer_on_fable_elementary_circuit():
    from qkan_implementation_tpu.encoding import fable
    from qkan_implementation_tpu.sim import unitary

    rng = np.random.default_rng(5)
    a = rng.uniform(-1, 1, (4, 4))
    circ, alpha = fable(a, fused=False)
    opt = nb.optimize_circuit(circ)
    # elementary FABLE is already peephole-minimal (the Gray-code ladder
    # interleaves every Ry pair with a CX on the same target): pin the
    # exact no-op, then verify the optimizer DOES cancel when given
    # something cancellable appended to the same circuit (<= alone passes
    # for a keep-everything no-op optimizer)
    assert len(opt.gates) == len(circ.gates)
    np.testing.assert_allclose(
        np.asarray(unitary(opt)), np.asarray(unitary(circ)), atol=1e-9
    )
    circ.h(0).h(0)  # self-inverse pair the peephole must remove
    opt2 = nb.optimize_circuit(circ)
    assert len(opt2.gates) == len(circ.gates) - 2
    np.testing.assert_allclose(
        np.asarray(unitary(opt2)), np.asarray(unitary(circ)), atol=1e-9
    )


def test_circuit_depth_native_matches_python():
    from qkan_implementation_tpu.native_bindings import (
        circuit_depth_native,
        native_available,
    )
    from qkan_implementation_tpu.sim import Circuit

    if not native_available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(2)
    circ = Circuit(5)
    for _ in range(40):
        k = int(rng.integers(0, 3))
        if k == 0:
            circ.h(int(rng.integers(0, 5)))
        elif k == 1:
            a, b = rng.choice(5, size=2, replace=False)
            circ.cx(int(a), int(b))
        else:
            circ.ry(float(rng.uniform(-1, 1)), int(rng.integers(0, 5)))
    assert circuit_depth_native(circ) == circ.depth()

    # 3+-qubit gates can't ride the 2-slot ABI: falls back to Python
    # depth.  The fallback IS circuit.depth(), so comparing them is x==x;
    # pin the value on a hand-computed circuit instead.
    c2 = Circuit(5)
    c2.h(0)                                     # level 1 on qubit 0
    c2.ucry(np.zeros(4), controls=(1, 2), target=3)  # level 1 on 1,2,3
    c2.h(3)                                     # level 2 on qubit 3
    assert circuit_depth_native(c2) == 2
    assert c2.depth() == 2


def test_native_statevector_matches_jax_all_gates():
    """The C++ Aer-class engine (qkan_sv_run) agrees amplitude-for-amplitude
    with sim.statevector.simulate on every supported gate, including the
    index conventions that matter: ucry controls MSB-first, diag qubits
    MSB-first, little-endian qubit weights."""
    import jax

    from qkan_implementation_tpu.sim import simulate
    from qkan_implementation_tpu.sim.circuit import Circuit

    rng = np.random.default_rng(0)
    q = 8
    c = Circuit(q)
    for t in range(q):
        c.h(t)
    c.x(2)
    c.z(3)
    for t in range(q):
        c.ry(float(rng.uniform(-3, 3)), t)
    c.rz(0.7, 1)
    c.cx(0, 4)
    c.cz(2, 5)
    c.swap(1, 6)
    c.cry(1.1, 3, 7)
    c.ucry(rng.uniform(-3, 3, 2 ** (q - 1)), tuple(range(q - 2, -1, -1)), q - 1)
    c.diagonal(np.exp(1j * rng.uniform(-3, 3, 8)), (5, 3, 1))
    ref = np.asarray(jax.device_get(simulate(c))).astype(np.complex128)
    out = nb.statevector_native(c)
    np.testing.assert_allclose(out, ref, atol=1e-12)
    # norm preserved (unitary evolution)
    assert abs(np.vdot(out, out).real - 1.0) < 1e-12


def test_native_statevector_fable_and_reuse():
    """FABLE block-encoding circuit parity + encoded-stream reuse +
    custom psi0."""
    import jax

    from qkan_implementation_tpu.encoding import fable
    from qkan_implementation_tpu.sim import simulate

    rng = np.random.default_rng(3)
    a = rng.uniform(-1, 1, (8, 8))
    circ, _ = fable(a)
    ref = np.asarray(jax.device_get(simulate(circ))).astype(np.complex128)
    enc = nb.sv_encode_circuit(circ)
    out = nb.statevector_native(circ, encoded=enc)
    np.testing.assert_allclose(out, ref, atol=1e-12)

    psi0 = rng.normal(size=2**circ.num_qubits) + 1j * rng.normal(
        size=2**circ.num_qubits
    )
    psi0 /= np.linalg.norm(psi0)
    ref2 = np.asarray(
        jax.device_get(simulate(circ, psi0=np.asarray(psi0)))
    ).astype(np.complex128)
    out2 = nb.statevector_native(circ, psi0=psi0, encoded=enc)
    np.testing.assert_allclose(out2, ref2, atol=1e-12)


def test_native_statevector_rejects_unitary_gate():
    from qkan_implementation_tpu.sim.circuit import Circuit

    c = Circuit(2)
    c.unitary(np.eye(4), (1, 0))
    with pytest.raises(ValueError, match="unitary"):
        nb.sv_encode_circuit(c)


def test_native_single_sweep_and_beta_validation():
    """num_sweeps=1 must anneal HOT (beta0, matching np.geomspace) and a
    non-positive beta endpoint must raise instead of silently producing
    NaN-schedule quench samples (review r3)."""
    import pytest
    from qkan_implementation_tpu.native_bindings import anneal_native

    rng = np.random.default_rng(0)
    n = 10
    J = rng.normal(0, 1, (n, n))
    J = (J + J.T) / 2
    np.fill_diagonal(J, 0.0)
    model = QuboModel(h=rng.normal(0, 1, n), J=J, offset=0.0)
    with pytest.raises(ValueError, match="beta_range"):
        anneal_native(model, num_reads=2, num_sweeps=4, beta_range=(0.0, 10.0))
    # one HOT sweep at beta0=1e-3 accepts nearly every proposal: samples
    # should differ across reads (a quench at beta1 would lock them into
    # near-identical local minima from similar inits far more often)
    s, e = anneal_native(model, num_reads=32, num_sweeps=1,
                         beta_range=(1e-3, 50.0), seed=1)
    assert np.isfinite(e).all()
    assert len({tuple(row) for row in s.astype(int)}) > 8
