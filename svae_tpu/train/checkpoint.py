"""Checkpoint / resume: save and restore the full training state pytree.

Greenfield subsystem (the reference has none -- SURVEY.md section 5): the
state is ``(pgm_params, net_params, opt_state, prng_key, step)``; resume
must reproduce the ELBO trajectory exactly, which the round-trip test
asserts. Format: a single ``np.savez`` archive of the flattened leaves plus
a versioned ``__structure__`` JSON fingerprint (per-leaf key path + shape +
dtype; v1 checkpoints carried a treedef-repr tag instead and degrade to a
shape-only check) -- no pickle, no external deps, portable across hosts.
"""

import json
import os

import jax
import numpy as np


FORMAT_VERSION = 2


def _key_entry(k):
    """Normalize one typed pytree key to a plain JSON value. Built from
    the key OBJECTS (DictKey.key / SequenceKey.idx / GetAttrKey.name),
    never their reprs, so a JAX version changing how keys print cannot
    change the fingerprint."""
    for attr in ("key", "idx", "name"):
        if hasattr(k, attr):
            return str(getattr(k, attr))
    return str(k)


def _structure(state, leaves):
    """Versioned structural fingerprint: per-leaf key path + shape +
    dtype.

    Deliberately NOT the treedef repr -- a JAX version changing how
    treedefs print must not invalidate old checkpoints. Key path +
    shape/dtype per leaf catches every real mismatch (wrong model size,
    wrong optimizer, renamed/reordered factors) while being stable
    across JAX releases."""
    paths = [
        "/".join(_key_entry(k) for k in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(state)[0]
    ]
    return {
        "version": FORMAT_VERSION,
        "leaves": [
            {"path": p,
             "shape": list(np.asarray(l).shape),
             "dtype": np.asarray(l).dtype.name}
            for p, l in zip(paths, leaves)
        ],
    }


def save(path, state):
    """Serialize a pytree of arrays to ``path`` (.npz)."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__structure__"] = np.frombuffer(
        json.dumps(_structure(state, leaves)).encode(), dtype=np.uint8
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def restore(path, like, cast=False):
    """Restore a pytree with the structure of ``like`` from ``path``.

    Raises ValueError if the stored leaf structure (count + shapes +
    dtypes) does not match ``like``. A dtype mismatch (e.g. an f64-trained
    checkpoint restored into an f32 template) raises unless ``cast=True``
    is passed explicitly -- the cast is lossy, so it must be opted into,
    never silent. Checkpoints written by the v1 format (treedef-repr tag)
    are still restorable: they degrade to a shape-only structural check
    (the repr itself is never compared, so JAX repr changes cannot
    invalidate them; v1 stored no dtypes, so the dtype check does not
    apply to them)."""
    leaves, treedef = jax.tree.flatten(like)
    with np.load(path) as data:
        n_stored = sum(1 for k in data.files if k.startswith("leaf_"))
        if n_stored != len(leaves):
            raise ValueError(
                f"checkpoint structure mismatch: {n_stored} stored leaves "
                f"vs {len(leaves)} expected"
            )
        new_leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
        if "__structure__" in data.files:
            stored = json.loads(bytes(data["__structure__"]).decode())
            expected = _structure(like, leaves)
            for i, (s, e) in enumerate(
                    zip(stored["leaves"], expected["leaves"])):
                if s["shape"] != e["shape"] or s.get("path", e["path"]) != \
                        e["path"]:
                    raise ValueError(
                        f"checkpoint structure mismatch at leaf {i}: "
                        f"stored {s.get('path')} shape {s['shape']} vs "
                        f"expected {e['path']} shape {e['shape']}"
                    )
                if not cast and s.get("dtype", e["dtype"]) != e["dtype"]:
                    raise ValueError(
                        f"checkpoint dtype mismatch at leaf {i} "
                        f"({e['path']}): stored {s['dtype']} vs expected "
                        f"{e['dtype']}; pass cast=True to coerce "
                        f"explicitly (lossy)"
                    )
        else:  # v1 checkpoint: structural check from the arrays themselves
            for i, (new, old) in enumerate(zip(new_leaves, leaves)):
                if tuple(new.shape) != tuple(np.asarray(old).shape):
                    raise ValueError(
                        f"checkpoint structure mismatch at leaf {i}: "
                        f"stored shape {tuple(new.shape)} vs expected "
                        f"{tuple(np.asarray(old).shape)}"
                    )
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
