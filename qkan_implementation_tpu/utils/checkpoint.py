"""Checkpointing helpers: npz for single-host, orbax for sharded pytrees.

The reference persists torch state dicts (KAN_w_cumulative_polynomials.py:
574-598) and pickled numpy dicts (DegreeOptimizer.py:314-386).  The
framework's npz format covers single-host use; for sharded training state
(params laid out across a mesh) these wrappers use orbax, which restores
arrays with their shardings.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import numpy as np


def save_pytree(path: str, pytree: Any) -> None:
    """Save a pytree of (possibly sharded) arrays with orbax."""
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, pytree, force=True)


def load_pytree(path: str, target: Any | None = None) -> Any:
    """Restore a pytree saved by ``save_pytree``.

    ``target``: an example pytree (e.g. ``jax.eval_shape`` output or abstract
    arrays with shardings) directing restoration; None restores as saved.
    """
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is None:
            return ckptr.restore(path)
        return ckptr.restore(path, item=target)


def save_npz(path: str, tree: dict) -> None:
    """Flat dict of arrays -> npz (the single-host fast path)."""
    np.savez(path, **{k: np.asarray(v) for k, v in tree.items()})


def load_npz(path: str) -> dict:
    if not str(path).endswith(".npz"):
        path = str(path) + ".npz"
    with np.load(path) as data:
        return {k: data[k] for k in data.files}
