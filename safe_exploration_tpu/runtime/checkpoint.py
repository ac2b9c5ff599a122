"""Checkpoint / resume of experiment state.

The reference has NO mid-run resume (SURVEY.md §5.4 — sacred only stores config
and metrics). Here the full experiment state — GP dataset + posterior factors +
hyperparameters, SafeMPC controller state (stored safe plan, failure counters,
warm starts), RNG key and episode counter — is a pytree, so checkpointing is
exact: a resumed run continues bit-identically (same RNG stream, same factors).

Format: numpy ``.npz`` for leaves + a pickled treedef sidecar via
``jax.tree.flatten``; no orbax dependency needed for these small states (the
sharded large-GP tier can move to orbax later without changing this API).
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint"]


def save_checkpoint(path: str, state: Any) -> str:
    """Serialize a pytree (flax struct dataclasses included) to ``path``.

    Static metadata (e.g. GP kernel-type tuples) lives in the treedef and is
    pickled alongside the leaf arrays.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves, treedef = jax.tree.flatten(state)
    arrays = [np.asarray(jax.device_get(leaf)) for leaf in leaves]
    with open(path, "wb") as f:
        pickle.dump({"treedef": treedef, "leaves": arrays}, f)
    return path


def load_checkpoint(path: str) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint` (arrays come back as
    device arrays on first use — jax converts lazily)."""
    import jax.numpy as jnp

    with open(path, "rb") as f:
        blob = pickle.load(f)
    leaves = [jnp.asarray(a) for a in blob["leaves"]]
    return jax.tree.unflatten(blob["treedef"], leaves)


def latest_checkpoint(directory: str, prefix: str = "ckpt_") -> str | None:
    """Highest-numbered ``{prefix}{step}.pkl`` in ``directory`` (or None)."""
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    for name in os.listdir(directory):
        if name.startswith(prefix) and name.endswith(".pkl"):
            try:
                step = int(name[len(prefix):-4])
            except ValueError:
                continue
            if step > best_step:
                best, best_step = os.path.join(directory, name), step
    return best
