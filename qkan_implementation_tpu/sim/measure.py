"""Measurement & sampling on statevectors (Aer's sampling-side parity).

The reference only ever extracts unitaries, but Aer's simulator surface also
provides probabilities, counts, and expectation values; production serving
of quantum-verified models needs the same.  Everything except
``sample_counts`` is jit-friendly (counting into a python dict is a host
operation by nature).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def probabilities(psi: jax.Array) -> jax.Array:
    """|amplitude|^2, normalized (guards simulator round-off)."""
    p = jnp.abs(psi) ** 2
    return p / jnp.sum(p)


def sample_counts(psi: jax.Array, shots: int, key):
    """Measurement counts over ``shots`` samples (host-side; not jittable).

    Returns (bitstring_indices [shots], counts dict {basis_index: count}).
    """
    p = probabilities(psi)
    idx = jax.random.categorical(
        key, jnp.log(jnp.maximum(p, 1e-38)), shape=(shots,)
    )
    idx_np = np.asarray(idx)
    unique, counts = np.unique(idx_np, return_counts=True)
    return idx_np, {int(u): int(c) for u, c in zip(unique, counts)}


def expectation_diagonal(psi: jax.Array, diag: jax.Array) -> jax.Array:
    """<psi| D |psi> for a diagonal observable D (e.g. Z-string energies)."""
    return jnp.sum(probabilities(psi) * diag)


def marginal_probabilities(psi: jax.Array, qubits, num_qubits: int) -> jax.Array:
    """Probability distribution over a subset of qubits (qubits[0] = MSB of
    the result index), marginalizing the rest."""
    p = probabilities(psi).reshape(-1)
    size = p.shape[0]
    # accumulate with a static index map
    idx = np.zeros(size, dtype=np.int64)
    r = np.arange(size)
    k = len(qubits)
    for i, t in enumerate(qubits):
        idx |= ((r >> t) & 1) << (k - 1 - i)
    return jax.ops.segment_sum(p, jnp.asarray(idx), num_segments=2**k)
