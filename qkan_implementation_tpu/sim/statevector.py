"""Dense statevector / unitary simulation of gate-IR circuits.

The TPU-native replacement for Qiskit Aer's ``unitary_simulator`` (the
reference's only quantum runtime, ``MulStep.py:115-166``).  Amplitudes live
in a flat ``[2**q]`` array viewed as a ``(2,)*q`` tensor during gate
application; every gate is a (batched) tensor contraction or fused
elementwise op, so the whole circuit jit-compiles into one XLA program.
Unitary construction = vmap over identity columns.

Real circuits (H/X/Ry/CNOT/SWAP/UCRY -- everything FABLE emits) simulate in
real dtype, halving bandwidth; complex circuits promote automatically.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from qkan_implementation_tpu.sim.circuit import (
    Circuit,
    Gate,
    GATE_MATRICES,
    SWAP_MATRIX,
    controlled,
    ry_matrix,
    rz_matrix,
)

_REAL_GATES = {"h", "x", "z", "ry", "cx", "cz", "cry", "swap", "ucry"}


def circuit_is_real(circuit: Circuit) -> bool:
    """True if every gate has a real matrix (so real-dtype simulation is exact)."""
    for g in circuit.gates:
        if g.name in _REAL_GATES:
            continue
        if g.name in ("diag", "unitary"):
            dtype = getattr(g.params, "dtype", None)
            if dtype is not None:
                if np.issubdtype(dtype, np.complexfloating):
                    return False
            elif not np.isrealobj(np.asarray(g.params)):
                return False
            continue
        return False
    return True


def default_dtype(circuit: Circuit):
    x64 = jax.config.jax_enable_x64
    if circuit_is_real(circuit):
        return jnp.float64 if x64 else jnp.float32
    return jnp.complex128 if x64 else jnp.complex64


def zero_state(num_qubits: int, dtype=None) -> jax.Array:
    dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    psi = jnp.zeros(2**num_qubits, dtype=dtype)
    return psi.at[0].set(1.0)


def _gate_matrix(gate: Gate) -> np.ndarray:
    """Dense matrix of any non-fused gate (numpy, float64/complex128)."""
    if gate.name in GATE_MATRICES:
        return GATE_MATRICES[gate.name]
    if gate.name == "ry":
        return ry_matrix(gate.params[0])
    if gate.name == "rz":
        return rz_matrix(gate.params[0])
    if gate.name == "cx":
        return controlled(GATE_MATRICES["x"])
    if gate.name == "cz":
        return controlled(GATE_MATRICES["z"])
    if gate.name == "cry":
        return controlled(ry_matrix(gate.params[0]))
    if gate.name == "swap":
        return SWAP_MATRIX
    if gate.name == "unitary":
        dim = 2 ** len(gate.qubits)
        return jnp.asarray(gate.params).reshape(dim, dim)
    raise ValueError(f"Unknown gate {gate.name}")


def _apply_dense(psi_t, matrix, qubits, num_qubits):
    """Apply a k-qubit dense gate to the (2,)*q tensor ``psi_t``.

    ``qubits[0]`` is the most significant bit of the gate index; qubit t
    lives on tensor axis q-1-t (little-endian flat index).
    """
    k = len(qubits)
    axes = [num_qubits - 1 - t for t in qubits]
    m = jnp.asarray(matrix, dtype=psi_t.dtype).reshape((2,) * (2 * k))
    out = jnp.tensordot(m, psi_t, axes=(list(range(k, 2 * k)), axes))
    # tensordot puts the gate's output axes first, in qubits order
    return jnp.moveaxis(out, list(range(k)), axes)


def _apply_ucry(psi_t, thetas, target, controls, num_qubits):
    """Fused uniformly-controlled Ry: one vectorized elementwise update.

    Equivalent to FABLE's 2*4^n Ry/CNOT gray-code ladder but O(2^q) work in a
    single VPU-friendly op -- the hot path of block-encoding simulation.
    """
    q = num_qubits
    ax_t = q - 1 - target
    psi_m = jnp.moveaxis(psi_t, ax_t, 0)  # target axis to front

    # Broadcast thetas over the moved layout: axis 0 is the target; the
    # remaining axes keep their relative order.
    th = jnp.asarray(thetas, dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    th = th.reshape((2,) * len(controls))
    pos = []
    for c in controls:
        a = q - 1 - c
        pos.append(1 + a - (1 if a > ax_t else 0))
    order = np.argsort(pos)
    th = jnp.transpose(th, tuple(order))
    shape = [1] * q
    for p in pos:
        shape[p] = 2
    th_b = th.reshape(shape)[0]  # drop the leading broadcast axis

    half = th_b / 2.0
    c = jnp.cos(half).astype(psi_m.dtype)
    s = jnp.sin(half).astype(psi_m.dtype)
    p0, p1 = psi_m[0], psi_m[1]
    new0 = c * p0 - s * p1
    new1 = s * p0 + c * p1
    psi_m = jnp.stack([new0, new1], axis=0)
    return jnp.moveaxis(psi_m, 0, ax_t)


def _apply_diag(psi_t, phases, qubits, num_qubits):
    """Fused diagonal gate: elementwise multiply broadcast over pattern axes."""
    q = num_qubits
    ph = jnp.asarray(phases).reshape((2,) * len(qubits))
    pos = [q - 1 - t for t in qubits]
    order = np.argsort(pos)
    ph = jnp.transpose(ph, tuple(order))
    shape = [1] * q
    for p in pos:
        shape[p] = 2
    return psi_t * ph.reshape(shape).astype(psi_t.dtype)


def apply_gate(psi: jax.Array, gate: Gate, num_qubits: int) -> jax.Array:
    """Apply one gate to a flat [2**q] statevector."""
    psi_t = psi.reshape((2,) * num_qubits)
    if gate.name == "ucry":
        target, controls = gate.qubits[0], gate.qubits[1:]
        out = _apply_ucry(psi_t, gate.params, target, controls, num_qubits)
    elif gate.name == "diag":
        out = _apply_diag(psi_t, gate.params, gate.qubits, num_qubits)
    else:
        out = _apply_dense(psi_t, _gate_matrix(gate), gate.qubits, num_qubits)
    return out.reshape(-1)


def simulate(circuit: Circuit, psi0: jax.Array | None = None, dtype=None) -> jax.Array:
    """Run ``circuit`` on ``psi0`` (default |0...0>); returns the final state.

    The gate loop unrolls at trace time (the circuit is static data), so under
    ``jax.jit`` the whole circuit fuses into one XLA computation.
    """
    dtype = dtype or default_dtype(circuit)
    psi = zero_state(circuit.num_qubits, dtype) if psi0 is None else psi0.astype(dtype)
    for gate in circuit.gates:
        psi = apply_gate(psi, gate, circuit.num_qubits)
    return psi


def unitary(circuit: Circuit, dtype=None) -> jax.Array:
    """Dense unitary of ``circuit``: vmap of ``simulate`` over identity columns.

    Replaces Aer's ``unitary_simulator`` path
    (reference ``MulStep.py:120-122``).  U[:, j] = circuit |j>.
    """
    dtype = dtype or default_dtype(circuit)
    dim = 2**circuit.num_qubits
    eye = jnp.eye(dim, dtype=dtype)
    cols = jax.vmap(lambda col: simulate(circuit, col, dtype))(eye)
    return cols.T  # row i of cols is U|i>, i.e. column i of U


def compile_simulator(circuit: Circuit, dtype=None):
    """Return a jitted ``psi0 -> psi_final`` function for repeated use."""
    dtype = dtype or default_dtype(circuit)
    return jax.jit(partial(simulate, circuit, dtype=dtype))
