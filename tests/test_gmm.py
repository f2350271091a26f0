"""GMM-SVAE model tests.

Local-KL derivation used by the K=1 oracle below: with expected natparams
E[eta] (incl. const) and recognition potential psi, the mean-field q(x) has
natparam E[eta] + psi and

  local_kl = E_q[log q(x) - E_{q(theta)} log p(x)]
           = <psi, E_q t(x)> - logZ(E[eta] + psi) - const,

which for K=1 must agree with the model's general formula.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svae_tpu.expfam import gaussian, niw, dirichlet
from svae_tpu.models import gmm
from svae_tpu.utils.pytree import tree_dot

KEY = jax.random.PRNGKey(42)


def _setup(K=4, d=2, B=6, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    glob = gmm.init_pgm_param(k1, K, d, dtype=jnp.float64)
    J = jax.nn.softplus(jax.random.normal(k2, (B, d), jnp.float64)) + 0.5
    h = jax.random.normal(jax.random.PRNGKey(seed + 1), (B, d), jnp.float64)
    return glob, (J, h)


def test_meanfield_fixed_point_stationary():
    glob, pots = _setup()
    r1, q1, s1, kl1 = gmm.local_meanfield(glob, pots, num_iters=200)
    r2, q2, s2, kl2 = gmm.local_meanfield(glob, pots, num_iters=201)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-8)
    np.testing.assert_allclose(float(kl1), float(kl2), rtol=1e-8)


def test_local_kl_nonnegative():
    glob, pots = _setup(K=5, B=9, seed=3)
    _, _, _, kl = gmm.local_meanfield(glob, pots, num_iters=60)
    assert float(kl) >= -1e-8


def test_local_kl_matches_k1_oracle():
    glob, pots = _setup(K=1, d=3, B=5, seed=7)
    _, qx, stats, kl = gmm.local_meanfield(glob, pots, num_iters=5)
    dir_np, niw_np = glob
    (E_eta1, E_eta2), const = niw.expected_gaussian_natparam(niw_np)
    node = gaussian.pack_dense(*pots)
    q_eta = (node[0] + E_eta1[0], node[1] + E_eta2[0])
    s = gaussian.expectedstats(q_eta)
    want = float(
        jnp.sum(
            jnp.einsum("bij,bij->b", node[0], s[0])
            + jnp.einsum("bi,bi->b", node[1], s[1])
            - gaussian.logZ(q_eta)
            - const[0]
        )
    )
    np.testing.assert_allclose(float(kl), want, rtol=1e-8)


def test_stats_congruent_and_counts():
    glob, pots = _setup(K=4, B=6)
    samples, stats, gkl, lkl = gmm.run_inference(
        glob, glob, pots, KEY, num_samples=3, num_meanfield_iters=30
    )
    assert samples.shape == (3, 6, 2)
    assert jax.tree.structure(stats) == jax.tree.structure(glob)
    dir_stats, niw_stats = stats
    # responsibilities sum to B across clusters
    np.testing.assert_allclose(float(jnp.sum(dir_stats)), 6.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(niw_stats[2]),
                               np.asarray(dir_stats), rtol=1e-6)


def test_prior_kl_zero_at_prior_and_positive_away():
    glob, _ = _setup()
    assert abs(float(gmm.prior_kl(glob, glob))) < 1e-8
    other = jax.tree.map(lambda a: a * 1.1 + 0.01, glob)
    assert float(gmm.prior_kl(other, glob)) > 0


def test_elbo_gradients_flow_to_recognition_potentials():
    glob, pots = _setup(K=3, B=4)

    def f(pots):
        _, _, _, kl = gmm.local_meanfield(glob, pots, num_iters=40)
        return kl

    g = jax.grad(f)(pots)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in g)
    # at the fixed point, d local_kl / d psi should be nonzero in general
    assert float(sum(jnp.sum(jnp.abs(x)) for x in g)) > 1e-6


def test_local_kl_grad_matches_finite_difference():
    """Stationarity of the mean-field fixed point => truncated-backprop
    gradients agree with full finite differences (SURVEY.md 3.4)."""
    glob, pots = _setup(K=3, d=2, B=3, seed=11)

    def f(pots):
        _, _, _, kl = gmm.local_meanfield(glob, pots, num_iters=300,
                                          num_diff_iters=40)
        return kl

    g = jax.grad(f)(pots)
    J, h = pots
    eps = 1e-5
    for idx in [(1, 0), (0, 1), (2, 1)]:
        dh = jnp.zeros_like(h).at[idx].set(eps)
        fd = (f((J, h + dh)) - f((J, h - dh))) / (2 * eps)
        np.testing.assert_allclose(float(g[1][idx]), float(fd), rtol=1e-4,
                                   atol=1e-7)
        dJ = jnp.zeros_like(J).at[idx].set(eps)
        fdJ = (f((J + dJ, h)) - f((J - dJ, h))) / (2 * eps)
        np.testing.assert_allclose(float(g[0][idx]), float(fdJ), rtol=1e-4,
                                   atol=1e-7)


def test_classify_matches_meanfield_labels():
    glob, pots = _setup(K=4, B=7, seed=12)
    r = gmm.classify(glob, pots, num_meanfield_iters=40)
    r2, _, _, _ = gmm.local_meanfield(glob, pots, num_iters=40)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(jnp.sum(r, -1)),
                               np.ones(7), rtol=1e-6)


def test_meanfield_matches_numpy_oracle():
    """The f64 NumPy mean-field twin (ops/oracles.py:gmm_meanfield_seq, the
    bench.py GMM CPU denominator) computes the same fixed point as the JAX
    lax.scan mean-field -- same labels and same q(x) moments."""
    from svae_tpu.ops import oracles

    glob, (J, h) = _setup(K=5, d=3, B=9, seed=21)
    r_jax, qx, stats, _ = gmm.local_meanfield(glob, (J, h), num_iters=60)

    dir_natparam, niw_natparam = glob
    e_logpi = dirichlet.expectedstats(dir_natparam)
    (E_eta1, E_eta2), const = niw.expected_gaussian_natparam(niw_natparam)
    r_np, (ExxT_np, mu_np) = oracles.gmm_meanfield_seq(
        e_logpi, E_eta1, E_eta2, const, J, h, num_iters=60)

    np.testing.assert_allclose(np.asarray(r_jax), r_np, atol=1e-7)
    ExxT, Ex = stats
    np.testing.assert_allclose(np.asarray(Ex), mu_np, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ExxT), ExxT_np, atol=1e-7)
