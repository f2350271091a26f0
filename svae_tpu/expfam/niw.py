"""Normal-inverse-Wishart: conjugate prior for a Gaussian's (mu, Sigma).

Standard parameterization ``NIW(mu, Sigma | m, kappa, Phi, nu)``:

  ``Sigma ~ IW(Phi, nu)``, ``mu | Sigma ~ N(m, Sigma / kappa)``.

Gaussian-likelihood sufficient statistics of (mu, Sigma) (the pairing used
throughout the GMM/LDS models):

  ``t = ( -1/2 Sigma^-1,  Sigma^-1 mu,  -1/2 mu^T Sigma^-1 mu,
          -1/2 logdet(Sigma) )``

Natural parameters (derived by expanding the NIW log-density in t):

  ``eta = ( Phi + kappa m m^T,  kappa m,  kappa,  nu + d + 2 )``

``expectedstats`` is closed form and equals ``jax.grad(logZ)`` (tested).
(reference: svae/distributions/niw.py)
"""

import jax.numpy as jnp
from jax.scipy.special import multigammaln, digamma

from svae_tpu.utils.psd import symmetrize, logdet_psd, inv_psd, solve_psd


def standard_to_natural(Phi, m, kappa, nu):
    d = m.shape[-1]
    eta1 = Phi + kappa[..., None, None] * (m[..., :, None] * m[..., None, :])
    eta2 = kappa[..., None] * m
    return (eta1, eta2, kappa, nu + d + 2)


def natural_to_standard(natparam):
    eta1, eta2, eta3, eta4 = natparam
    d = eta2.shape[-1]
    kappa = eta3
    m = eta2 / kappa[..., None]
    Phi = eta1 - (eta2[..., :, None] * eta2[..., None, :]) / kappa[..., None, None]
    nu = eta4 - d - 2
    return symmetrize(Phi), m, kappa, nu


def logZ(natparam):
    """log of the NIW normalizer as a function of natural parameters.

    ``logZ = d/2 log(2 pi / kappa) + nu d / 2 log 2 + log Gamma_d(nu/2)
             - nu/2 logdet(Phi)``
    """
    Phi, m, kappa, nu = natural_to_standard(natparam)
    d = m.shape[-1]
    return (
        0.5 * d * (jnp.log(2 * jnp.pi) - jnp.log(kappa))
        + 0.5 * nu * d * jnp.log(2.0)
        + multigammaln(0.5 * nu, d)
        - 0.5 * nu * logdet_psd(Phi)
    )


def _E_neg_half_logdet_Sigma(Phi, nu, d):
    # E[logdet Sigma] under IW(Phi, nu) = logdet Phi - d log 2 - sum_i
    # digamma((nu + 1 - i)/2),  i = 1..d
    i = jnp.arange(1, d + 1, dtype=Phi.dtype)
    dig = jnp.sum(digamma(0.5 * (nu[..., None] + 1.0 - i)), axis=-1)
    E_logdet = logdet_psd(Phi) - d * jnp.log(2.0) - dig
    return -0.5 * E_logdet


def expectedstats(natparam):
    """E[t] = (E[-1/2 Sigma^-1], E[Sigma^-1 mu], E[-1/2 mu^T Sigma^-1 mu],
    E[-1/2 logdet Sigma]) in closed form."""
    Phi, m, kappa, nu = natural_to_standard(natparam)
    d = m.shape[-1]
    Phi_inv = inv_psd(Phi)
    E_Lam = nu[..., None, None] * Phi_inv  # E[Sigma^-1]
    E_t1 = -0.5 * E_Lam
    E_t2 = (E_Lam @ m[..., None])[..., 0]
    E_t3 = -0.5 * (d / kappa + jnp.sum(m * E_t2, axis=-1))
    E_t4 = _E_neg_half_logdet_Sigma(Phi, nu, d)
    return (E_t1, E_t2, E_t3, E_t4)


def expected_gaussian_natparam(natparam):
    """Expected Gaussian natural parameters (eta1, eta2) plus the expected
    scalar base terms, for building PGM potentials on latents:

    ``E[log N(x | mu, Sigma)] = <x x^T, E_t1> + <x, E_t2> + E_t3 + E_t4
                                - d/2 log(2 pi)``

    Returns ``((E_t1, E_t2), const)`` with const = E_t3 + E_t4 - d/2 log 2pi.
    """
    E_t1, E_t2, E_t3, E_t4 = expectedstats(natparam)
    d = E_t2.shape[-1]
    const = E_t3 + E_t4 - 0.5 * d * jnp.log(2 * jnp.pi)
    return (E_t1, E_t2), const
