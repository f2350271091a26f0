"""Multivariate Gaussian in natural (information) form.

Convention (used consistently across the whole framework):

  ``p(x) = exp( <eta1, x x^T> + <eta2, x> - logZ(eta) )``

with ``eta1 = -1/2 Lambda`` (negative-definite, Lambda the precision) and
``eta2 = Lambda mu``.  Sufficient statistics are ``(x x^T, x)`` so that
``grad(logZ) = (E[x x^T], E[x])``.

(reference: svae/distributions/gaussian.py -- expectedstats/logZ/
natural_sample/standard_to_natural; the reference packs (J, h, const) blocks,
we keep an explicit (eta1, eta2) tuple pytree.)
"""

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from svae_tpu.utils import smallchol
from svae_tpu.utils.psd import symmetrize, mvn_logZ_info, solve_psd, inv_psd


def standard_to_natural(mu, Sigma):
    """(mu, Sigma) -> (eta1, eta2) = (-1/2 Sigma^-1, Sigma^-1 mu)."""
    Lam = inv_psd(Sigma)
    return (-0.5 * Lam, (Lam @ mu[..., None])[..., 0])


def natural_to_standard(natparam):
    eta1, eta2 = natparam
    J = -2.0 * eta1  # precision
    Sigma = inv_psd(J)
    mu = solve_psd(J, eta2[..., None])[..., 0]
    return mu, Sigma


def info_params(natparam):
    """Return info form ``(J, h)`` with J = precision = -2 eta1, h = eta2."""
    eta1, eta2 = natparam
    return -2.0 * eta1, eta2


def from_info(J, h):
    """Info form (J, h) -> natural (eta1, eta2)."""
    return (-0.5 * J, h)


def logZ(natparam):
    """Log-partition; batched over leading axes."""
    eta1, eta2 = natparam
    return mvn_logZ_info(-2.0 * eta1, eta2)


def expectedstats(natparam):
    """Closed-form E[(x x^T, x)]; equals jax.grad(logZ) (tested)."""
    eta1, eta2 = natparam
    J = -2.0 * eta1
    Sigma = inv_psd(J)
    mu = (Sigma @ eta2[..., None])[..., 0]
    ExxT = symmetrize(Sigma + mu[..., :, None] * mu[..., None, :])
    return (ExxT, mu)


def natural_sample(natparam, key, num_samples=()):
    """Reparameterized sample(s): x = mu + L^{-T} eps with J = L L^T.

    ``num_samples`` is a leading shape tuple (or int). Differentiable w.r.t.
    the natural parameters -- this is the path the decoder gradient rides
    (reference: svae/distributions/gaussian.py:natural_sample).
    """
    if isinstance(num_samples, int):
        num_samples = (num_samples,)
    eta1, eta2 = natparam
    J = -2.0 * eta1
    L = smallchol.chol(symmetrize(J))
    mu = smallchol.cho_solve(L, eta2)
    eps = jax.random.normal(key, tuple(num_samples) + mu.shape, dtype=mu.dtype)
    # solve L^T z = eps  =>  z ~ N(0, J^{-1})  (broadcasts over the sample
    # axes; statically-unrolled substitution, svae_tpu/utils/smallchol.py)
    z = smallchol.solve_upper_from_lower(L, eps)
    return mu + z


def kl(natparam_q, natparam_p):
    """KL(q || p) between Gaussians given in natural form."""
    stats_q = expectedstats(natparam_q)
    from svae_tpu.utils.pytree import tree_dot, tree_sub

    return (
        tree_dot(tree_sub(natparam_q, natparam_p), stats_q)
        - logZ(natparam_q)
        + logZ(natparam_p)
    )


def pack_dense(J_diag, h):
    """Lift diagonal node potentials (J_diag > 0 precision diagonal, h) to the
    dense natural form (eta1 = -1/2 diag(J_diag), eta2 = h).

    Recognition networks emit diagonal potentials per datapoint/frame
    (reference: svae/recognition_models.py); models combine them with dense
    PGM potentials by plain addition in natural coordinates.
    """
    eta1 = -0.5 * jnp.vectorize(jnp.diag, signature="(d)->(d,d)")(J_diag)
    return (eta1, h)
