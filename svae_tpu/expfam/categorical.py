"""Categorical distribution over K labels in natural (logit) form.

Natural parameter: unnormalized log-probabilities ``eta`` (last axis = K),
sufficient statistic the one-hot indicator, so

  ``logZ = logsumexp(eta)``  and  ``expectedstats = softmax(eta)``
  (= grad(logZ), tested).

Used by the GMM label mean-field update and the SLDS discrete chain
(reference: label factors inline in svae/models/gmm.py).
"""

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp


def standard_to_natural(probs):
    return jnp.log(probs)


def natural_to_standard(natparam):
    return jax.nn.softmax(natparam, axis=-1)


def logZ(natparam):
    return jnp.sum(logsumexp(natparam, axis=-1))


def expectedstats(natparam):
    return jax.nn.softmax(natparam, axis=-1)
