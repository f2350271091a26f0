"""Pytree container algebra.

The reference hand-rolls nested-tuple arithmetic over natural-parameter
structures (reference: svae/util.py -- flat/add/sub/scale/contract/
zeros_like). In JAX the container substrate is the pytree, so these are thin
wrappers over ``jax.tree_util`` that keep the same algebraic API the training
core (natural-gradient assembly) consumes.
"""

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


def tree_add(a, b):
    """Elementwise sum of two congruent pytrees (reference: svae/util.py:add)."""
    return jax.tree.map(jnp.add, a, b)


def tree_sub(a, b):
    """Elementwise difference (reference: svae/util.py:sub)."""
    return jax.tree.map(jnp.subtract, a, b)


def tree_scale(a, s):
    """Scale every leaf by scalar ``s`` (reference: svae/util.py:scale)."""
    return jax.tree.map(lambda x: s * x, a)


def tree_dot(a, b):
    """Full inner product across two congruent pytrees.

    This is the pairing <natparam, stats> that appears throughout the ELBO
    and KL algebra (reference: svae/util.py:contract).
    """
    leaves = jax.tree.map(lambda x, y: jnp.sum(x * y), a, b)
    return jax.tree.reduce(jnp.add, leaves, jnp.asarray(0.0))


def tree_zeros_like(a):
    """Zero pytree congruent with ``a`` (reference: svae/util.py:zeros_like)."""
    return jax.tree.map(jnp.zeros_like, a)


def flat(a):
    """Ravel a pytree to a single vector (reference: svae/util.py:flat).

    Returns only the vector; use :func:`unflat` (or ``ravel_pytree``
    directly) when the inverse is needed.
    """
    vec, _ = ravel_pytree(a)
    return vec


def unflat(template, vec):
    """Unravel ``vec`` into the structure of ``template``."""
    _, unravel = ravel_pytree(template)
    return unravel(vec)
