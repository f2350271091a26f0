"""Matrix-normal-inverse-Wishart: conjugate prior for linear-Gaussian
dynamics ``x' = A x + w``, ``w ~ N(0, Sigma)``, with ``A`` a (d x n) matrix
(n = d, or d+1 when an affine/bias column is appended).

Standard parameterization ``MNIW(A, Sigma | M, V, Phi, nu)``:

  ``Sigma ~ IW(Phi, nu)``, ``A | Sigma ~ MN(M, Sigma, V)``
  (vec(A) ~ N(vec(M), V kron Sigma)).

Conditional-likelihood sufficient statistics of (A, Sigma) — the pairing the
LDS pair potentials use (reference: svae/distributions/mniw.py):

  ``t = ( -1/2 Sigma^-1,        (d,d)   pairs with  x' x'^T
          Sigma^-1 A,           (d,n)   pairs with  x' x^T
          -1/2 A^T Sigma^-1 A,  (n,n)   pairs with  x  x^T
          -1/2 logdet(Sigma) )  scalar  pairs with  1``

Natural parameters:

  ``eta = ( Phi + M V^-1 M^T,  M V^-1,  V^-1,  nu + d + 1 + n )``

``expectedstats`` is closed form and equals ``jax.grad(logZ)`` (tested).
"""

import jax.numpy as jnp
from jax.scipy.special import multigammaln, digamma

from svae_tpu.utils.psd import symmetrize, logdet_psd, inv_psd, solve_psd


def standard_to_natural(Phi, M, V, nu):
    d, n = M.shape[-2], M.shape[-1]
    V_inv = inv_psd(V)
    MVi = M @ V_inv
    eta1 = Phi + MVi @ jnp.swapaxes(M, -1, -2)
    return (eta1, MVi, V_inv, nu + d + 1 + n)


def natural_to_standard(natparam):
    eta1, eta2, eta3, eta4 = natparam
    d, n = eta2.shape[-2], eta2.shape[-1]
    V = inv_psd(eta3)
    M = eta2 @ V
    Phi = eta1 - eta2 @ V @ jnp.swapaxes(eta2, -1, -2)
    nu = eta4 - d - 1 - n
    return symmetrize(Phi), M, symmetrize(V), nu


def logZ(natparam):
    """``logZ = nd/2 log(2 pi) - d/2 logdet(V^-1) + nu d/2 log 2
              + log Gamma_d(nu/2) - nu/2 logdet(Phi)``"""
    eta1, eta2, eta3, eta4 = natparam
    d, n = eta2.shape[-2], eta2.shape[-1]
    Phi, M, V, nu = natural_to_standard(natparam)
    return (
        0.5 * n * d * jnp.log(2 * jnp.pi)
        - 0.5 * d * logdet_psd(eta3)
        + 0.5 * nu * d * jnp.log(2.0)
        + multigammaln(0.5 * nu, d)
        - 0.5 * nu * logdet_psd(Phi)
    )


def expectedstats(natparam):
    """Closed-form E[t]; equals jax.grad(logZ) (tested)."""
    Phi, M, V, nu = natural_to_standard(natparam)
    d, n = M.shape[-2], M.shape[-1]
    Phi_inv = inv_psd(Phi)
    E_Lam = nu[..., None, None] * Phi_inv  # E[Sigma^-1]
    E_t1 = -0.5 * E_Lam
    E_t2 = E_Lam @ M  # E[Sigma^-1 A]
    # E[A^T Sigma^-1 A] = M^T E[Sigma^-1] M + d V
    E_AtLA = jnp.swapaxes(M, -1, -2) @ E_t2 + d * V
    E_t3 = -0.5 * symmetrize(E_AtLA)
    i = jnp.arange(1, d + 1, dtype=M.dtype)
    dig = jnp.sum(digamma(0.5 * (nu[..., None] + 1.0 - i)), axis=-1)
    E_logdet_Sigma = logdet_psd(Phi) - d * jnp.log(2.0) - dig
    E_t4 = -0.5 * E_logdet_Sigma
    return (E_t1, E_t2, E_t3, E_t4)


def posterior_mean_params(natparam):
    """Posterior-mean dynamics ``(E[A], E[Sigma])`` -- the single source of
    truth for forecasting/rollout consumers (models.lds.predict):
    ``E[A] = M``, ``E[Sigma] = Phi / (nu - d - 1)`` (IW mean, nu > d+1)."""
    Phi, M, V, nu = natural_to_standard(natparam)
    d = M.shape[-2]
    E_Sigma = Phi / (nu[..., None, None] - d - 1.0)
    return M, symmetrize(E_Sigma)


def expected_pair_potential(natparam):
    """Expected LDS pair potential pieces for the Kalman kernels.

    ``E[log N(x' | A x, Sigma)] = <x' x'^T, E_t1> + <x' x^T, E_t2>
                                  + <x x^T, E_t3> + E_t4 - d/2 log(2 pi)``

    Returns ``(E_t1, E_t2, E_t3, const)`` with
    const = E_t4 - d/2 log(2 pi).
    """
    E_t1, E_t2, E_t3, E_t4 = expectedstats(natparam)
    d = E_t2.shape[-2]
    const = E_t4 - 0.5 * d * jnp.log(2 * jnp.pi)
    return (E_t1, E_t2, E_t3, const)
