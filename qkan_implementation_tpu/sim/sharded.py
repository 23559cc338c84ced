"""Mesh-sharded statevector simulation: 20+ qubit circuits across chips.

The reference's scaling ceiling is Aer's single-host 2^q amplitude array
(SURVEY.md section 5).  Here amplitudes are laid out flat [2^q] and sharded
contiguously over a 1-D device mesh, so with 2^k devices the top k qubits
are "global" (their bits select the device) and the rest are local:

- gates on local qubits run embarrassingly parallel inside ``shard_map``;
- *diagonal* structure needs no communication even on global qubits: a
  ``diag`` gate and the control register of a ``ucry`` only *select* -- the
  device index bits pick the parameter slice (this makes FABLE's multiplexed
  rotation nearly communication-free);
- non-diagonal action on a global qubit uses the qubit-index-remapping
  exchange: a hypercube pairwise ``ppermute`` swaps the global bit with a
  local one (the quantum-sim analog of ring/Ulysses sequence exchange),
  the gate applies locally, and the exchange undoes itself.

Tested against the dense engine on the virtual 8-device CPU mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qkan_implementation_tpu.parallel.collectives import pairwise_exchange
from qkan_implementation_tpu.sim.circuit import Circuit, Gate
from qkan_implementation_tpu.sim.statevector import (
    _apply_dense,
    _apply_ucry,
    _gate_matrix,
    default_dtype,
    zero_state,
)


def _exchange_global_local(
    psi, dev_bit: int, local_pos: int, axis_name: str, n_dev: int, q_local: int
):
    """Swap global qubit bit ``dev_bit`` (of the device index) with local
    qubit ``local_pos``: one bidirectional pairwise exchange of half a block.

    Amplitude (G=a, l=b) moves to (G=b, l=a); each device keeps the diagonal
    half and trades the off-diagonal half with its hypercube neighbor.
    Operates on the flat local block via an [outer, 2, inner] view.
    """
    shape = psi.shape
    inner = 2**local_pos
    v = psi.reshape(-1, 2, inner)
    g = (jax.lax.axis_index(axis_name) >> dev_bit) & 1
    h0 = v[:, 0, :]
    h1 = v[:, 1, :]
    send = jnp.where(g == 0, h1, h0)
    recv = pairwise_exchange(send, axis_name, dev_bit, n_dev)
    new0 = jnp.where(g == 0, h0, recv)
    new1 = jnp.where(g == 0, recv, h1)
    return jnp.stack([new0, new1], axis=1).reshape(shape)


def _select_global_control_angles(params, controls, q_local, axis_name):
    """Collapse global-control axes of a ucry/diag parameter tensor by
    indexing them with this device's bits.  Returns (local_params,
    local_controls)."""
    k = len(controls)
    th = jnp.asarray(params).reshape((2,) * k)
    idx = jax.lax.axis_index(axis_name)
    local_controls = []
    axis = 0
    for c in controls:
        if c >= q_local:  # global control: its value is a device-index bit
            bit = (idx >> (c - q_local)) & 1
            th = jnp.take(th, bit, axis=axis)
        else:
            local_controls.append(c)
            axis += 1
    return th.reshape(-1), tuple(local_controls)


def _apply_sharded_gate(psi_t, gate: Gate, q_local: int, axis_name: str, n_dev: int):
    if gate.name == "diag":
        phases, local_qubits = _select_global_control_angles(
            gate.params, gate.qubits, q_local, axis_name
        )
        from qkan_implementation_tpu.sim.statevector import _apply_diag

        return _apply_diag(psi_t, phases, local_qubits, q_local)

    if gate.name == "ucry":
        must_local = [gate.qubits[0]]
    else:
        must_local = [t for t in gate.qubits]

    # Exchange any must-be-local qubit that sits in a global position with a
    # local slot.  Slots not used by the gate are preferred; for ucry a slot
    # holding a *control* is also fine -- the displaced control becomes a
    # global control, which the angle-selection path handles for free.
    remap = {}
    exchanges = []
    free_locals = [p for p in range(q_local) if p not in gate.qubits]
    if gate.name == "ucry":
        control_slots = [p for p in range(q_local) if p in gate.qubits[1:]]
        free_locals = control_slots + free_locals  # prefer truly-free slots
    for t in must_local:
        if t >= q_local:
            if not free_locals:
                raise ValueError(
                    f"Gate {gate.name} on {gate.qubits} needs more local "
                    f"qubits than available ({q_local})"
                )
            l = free_locals.pop()
            psi_t = _exchange_global_local(
                psi_t, t - q_local, l, axis_name, n_dev, q_local
            )
            remap[t] = l
            remap[l] = t  # displaced qubit now lives at the global position
            exchanges.append((t - q_local, l))

    eff = lambda t: remap.get(t, t)

    if gate.name == "ucry":
        target = eff(gate.qubits[0])
        controls = tuple(eff(c) for c in gate.qubits[1:])
        thetas, local_controls = _select_global_control_angles(
            gate.params, controls, q_local, axis_name
        )
        psi_t = _apply_ucry(psi_t, thetas, target, local_controls, q_local)
    else:
        qubits = tuple(eff(t) for t in gate.qubits)
        if any(t >= q_local for t in qubits):
            raise AssertionError("dense gate retained a global qubit")
        psi_t = _apply_dense(psi_t, _gate_matrix(gate), qubits, q_local)

    for dev_bit, l in reversed(exchanges):  # the exchange is an involution
        psi_t = _exchange_global_local(
            psi_t, dev_bit, l, axis_name, n_dev, q_local
        )
    return psi_t


def sharded_simulate(
    circuit: Circuit,
    mesh: Mesh,
    axis_name: str = "d",
    psi0: jax.Array | None = None,
    dtype=None,
) -> jax.Array:
    """Run a circuit on a mesh-sharded statevector; returns the (sharded)
    final flat [2^q] state.

    The mesh size must be a power of two and smaller than 2^q.
    """
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    k = int(np.log2(n_dev))
    if 2**k != n_dev:
        raise ValueError(f"Mesh size {n_dev} must be a power of two")
    q = circuit.num_qubits
    if q <= k:
        raise ValueError(f"Need more qubits ({q}) than mesh bits ({k})")
    q_local = q - k
    dtype = dtype or default_dtype(circuit)

    if psi0 is None:
        psi0 = zero_state(q, dtype)
    psi0 = jax.device_put(psi0.astype(dtype), NamedSharding(mesh, P(axis_name)))

    def local_fn(block):  # flat [2^q_local] slice on each device
        psi = block
        for gate in circuit.gates:
            psi = _apply_sharded_gate(psi, gate, q_local, axis_name, n_dev)
        return psi

    fn = jax.jit(
        jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=P(axis_name),
            out_specs=P(axis_name),
        )
    )
    return fn(psi0)
