"""Named collective wrappers (the NCCL-equivalent surface).

One thin module so every collective the framework issues goes through a
single, swappable, CPU-testable interface (SURVEY.md section 5).  All
functions are meant to be called *inside* ``jax.shard_map``-decorated
functions with the mesh axis in scope; XLA lowers them to ICI collectives on
TPU slices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psum(x, axis_name: str):
    """All-reduce sum over the mesh axis (gradient/data aggregation)."""
    return jax.lax.psum(x, axis_name)


def pmean(x, axis_name: str):
    return jax.lax.pmean(x, axis_name)


def all_gather(x, axis_name: str, axis: int = 0, tiled: bool = True):
    return jax.lax.all_gather(x, axis_name, axis=axis, tiled=tiled)


def ppermute(x, axis_name: str, perm):
    """Point-to-point permutation (ring / pairwise exchange primitive)."""
    return jax.lax.ppermute(x, axis_name, perm)


def all_to_all(x, axis_name: str, split_axis: int, concat_axis: int):
    return jax.lax.all_to_all(x, axis_name, split_axis, concat_axis, tiled=True)


def pairwise_exchange(x, axis_name: str, partner_bit: int, n_devices: int):
    """Exchange ``x`` with the partner device differing in ``partner_bit``.

    The hypercube-edge exchange used by the sharded statevector's
    qubit-remapping step: device i swaps payloads with device i ^ (1 <<
    partner_bit).  Implemented as a single ppermute, which XLA maps to a
    bidirectional ICI exchange.
    """
    if n_devices & (n_devices - 1):
        raise ValueError(
            f"pairwise_exchange needs a power-of-two device count, got "
            f"{n_devices} (non-power counts leave some devices without a "
            f"hypercube partner)"
        )
    if (1 << partner_bit) >= n_devices:
        raise ValueError(
            f"partner_bit {partner_bit} out of range for {n_devices} "
            f"devices (need 1 << partner_bit < n_devices)"
        )
    perm = [(i, i ^ (1 << partner_bit)) for i in range(n_devices)]
    return jax.lax.ppermute(x, axis_name, perm)
