"""Checkpoint / resume: save and restore the full training state pytree.

Greenfield subsystem (the reference has none -- SURVEY.md section 5): the
state is ``(pgm_params, net_params, opt_state, prng_key, step)``; resume
must reproduce the ELBO trajectory exactly, which the round-trip test
asserts. Format: a single ``np.savez`` archive of the flattened leaves plus
the treedef repr as a consistency check -- no pickle, no external deps,
portable across hosts.
"""

import json
import os

import jax
import numpy as np


def save(path, state):
    """Serialize a pytree of arrays to ``path`` (.npz)."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def restore(path, like):
    """Restore a pytree with the structure of ``like`` from ``path``.

    Raises ValueError if the stored tree structure does not match.
    """
    leaves, treedef = jax.tree.flatten(like)
    with np.load(path) as data:
        stored_def = bytes(data["__treedef__"]).decode()
        if stored_def != str(treedef):
            raise ValueError(
                "checkpoint structure mismatch:\n"
                f"  stored:   {stored_def}\n  expected: {treedef}"
            )
        new_leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
    new_leaves = [
        np.asarray(new, dtype=np.asarray(old).dtype)
        for new, old in zip(new_leaves, leaves)
    ]
    return jax.tree.unflatten(treedef, new_leaves)


def latest(directory, prefix="ckpt_"):
    """Path of the highest-step checkpoint ``{prefix}{step}.npz`` in
    ``directory``, or None."""
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    for name in os.listdir(directory):
        if name.startswith(prefix) and name.endswith(".npz"):
            try:
                step = int(name[len(prefix):-4])
            except ValueError:
                continue
            if step > best_step:
                best, best_step = os.path.join(directory, name), step
    return best
