"""Dirichlet: conjugate prior for mixture weights and HMM transition rows.

Natural parameter ``eta = alpha - 1`` pairing with sufficient statistic
``log pi``. ``expectedstats`` is the digamma form and equals
``jax.grad(logZ)`` (tested). (reference: svae/distributions/dirichlet.py)

Arrays may carry leading batch axes; the distribution acts on the last axis
(so an HMM transition matrix prior is a (K, K) array = K independent rows).
"""

import jax.numpy as jnp
from jax.scipy.special import gammaln, digamma


def standard_to_natural(alpha):
    return alpha - 1.0


def natural_to_standard(natparam):
    return natparam + 1.0


def logZ(natparam):
    alpha = natparam + 1.0
    return jnp.sum(
        jnp.sum(gammaln(alpha), axis=-1) - gammaln(jnp.sum(alpha, axis=-1))
    )


def expectedstats(natparam):
    """E[log pi] = digamma(alpha) - digamma(sum alpha)."""
    alpha = natparam + 1.0
    return digamma(alpha) - digamma(jnp.sum(alpha, axis=-1, keepdims=True))
