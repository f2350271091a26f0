"""Property tests for the exponential-family layer.

The load-bearing identity everywhere is ``expectedstats == jax.grad(logZ)``
(the reference uses the gradient as the *implementation*; we use it as the
oracle for our closed forms -- SURVEY.md section 1 L1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svae_tpu.expfam import gaussian, niw, mniw, dirichlet, categorical
from svae_tpu.utils.pytree import tree_dot


def rand_psd(key, d, scale=1.0):
    a = jax.random.normal(key, (d, d))
    return scale * (a @ a.T + d * jnp.eye(d))


def assert_trees_close(a, b, rtol=1e-6, atol=1e-8):
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(x, y, rtol=rtol, atol=atol), a, b
    )


# ---------------------------------------------------------------- gaussian


class TestGaussian:
    def setup_method(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        self.d = 3
        self.mu = jax.random.normal(k1, (self.d,))
        self.Sigma = rand_psd(k2, self.d)
        self.nat = gaussian.standard_to_natural(self.mu, self.Sigma)

    def test_roundtrip(self):
        mu, Sigma = gaussian.natural_to_standard(self.nat)
        assert_trees_close((mu, Sigma), (self.mu, self.Sigma), rtol=1e-5)

    def test_expectedstats_is_grad_logZ(self):
        grad_stats = jax.grad(gaussian.logZ)(self.nat)
        stats = gaussian.expectedstats(self.nat)
        # grad w.r.t. eta1 returns an unsymmetrized gradient; the expected
        # stat E[xx^T] is symmetric, compare symmetrized.
        sym = lambda m: 0.5 * (m + m.T)
        assert_trees_close(sym(grad_stats[0]), stats[0], rtol=1e-5)
        assert_trees_close(grad_stats[1], stats[1], rtol=1e-5)

    def test_logZ_value(self):
        # against the closed form in standard params
        Lam = jnp.linalg.inv(self.Sigma)
        expected = (
            0.5 * self.d * jnp.log(2 * jnp.pi)
            + 0.5 * jnp.linalg.slogdet(self.Sigma)[1]
            + 0.5 * self.mu @ Lam @ self.mu
        )
        np.testing.assert_allclose(gaussian.logZ(self.nat), expected, rtol=1e-6)

    def test_natural_sample_moments(self):
        xs = gaussian.natural_sample(self.nat, jax.random.PRNGKey(1), 200_000)
        np.testing.assert_allclose(xs.mean(0), self.mu, atol=2e-2)
        emp_cov = jnp.cov(xs.T)
        np.testing.assert_allclose(emp_cov, self.Sigma, atol=5e-2, rtol=5e-2)

    def test_kl_self_is_zero(self):
        np.testing.assert_allclose(gaussian.kl(self.nat, self.nat), 0.0, atol=1e-8)

    def test_kl_positive(self):
        other = gaussian.standard_to_natural(self.mu + 1.0, 2.0 * self.Sigma)
        assert gaussian.kl(self.nat, other) > 0

    def test_pack_dense(self):
        J_diag = jnp.array([1.0, 2.0, 3.0])
        h = jnp.array([0.1, 0.2, 0.3])
        eta1, eta2 = gaussian.pack_dense(J_diag, h)
        np.testing.assert_allclose(eta1, -0.5 * jnp.diag(J_diag))
        np.testing.assert_allclose(eta2, h)
        # batched
        eta1b, _ = gaussian.pack_dense(jnp.stack([J_diag, 2 * J_diag]), jnp.stack([h, h]))
        assert eta1b.shape == (2, 3, 3)


# ---------------------------------------------------------------- niw


class TestNIW:
    def setup_method(self):
        key = jax.random.PRNGKey(2)
        k1, k2 = jax.random.split(key)
        self.d = 3
        self.Phi = rand_psd(k1, self.d)
        self.m = jax.random.normal(k2, (self.d,))
        self.kappa = jnp.asarray(2.5)
        self.nu = jnp.asarray(self.d + 4.0)
        self.nat = niw.standard_to_natural(self.Phi, self.m, self.kappa, self.nu)

    def test_roundtrip(self):
        Phi, m, kappa, nu = niw.natural_to_standard(self.nat)
        assert_trees_close(
            (Phi, m, kappa, nu), (self.Phi, self.m, self.kappa, self.nu), rtol=1e-5
        )

    def test_expectedstats_is_grad_logZ(self):
        grad_stats = jax.grad(niw.logZ)(self.nat)
        stats = niw.expectedstats(self.nat)
        sym = lambda m: 0.5 * (m + m.T)
        assert_trees_close(sym(grad_stats[0]), stats[0], rtol=1e-5)
        assert_trees_close(grad_stats[1], stats[1], rtol=1e-5)
        np.testing.assert_allclose(grad_stats[2], stats[2], rtol=1e-5)
        np.testing.assert_allclose(grad_stats[3], stats[3], rtol=1e-5)

    def test_expectedstats_monte_carlo(self):
        # sample (mu, Sigma) ~ NIW and check E[t] empirically
        rng = np.random.default_rng(0)
        n = 40_000
        nu, d = float(self.nu), self.d
        Phi = np.asarray(self.Phi)
        t1s = np.zeros((d, d))
        t2s = np.zeros(d)
        t3s = 0.0
        t4s = 0.0
        Phi_chol = np.linalg.cholesky(np.linalg.inv(Phi))
        for _ in range(n // 1000):
            for _ in range(1000):
                # Sigma^-1 ~ Wishart(Phi^-1, nu) via Bartlett
                A = np.tril(rng.standard_normal((d, d)), -1)
                A[np.diag_indices(d)] = np.sqrt(
                    rng.chisquare(nu - np.arange(d))
                )
                W = Phi_chol @ A
                Lam = W @ W.T  # ~ W(Phi^-1, nu)
                Sigma = np.linalg.inv(Lam)
                mu = np.asarray(self.m) + np.linalg.cholesky(
                    Sigma / float(self.kappa)
                ) @ rng.standard_normal(d)
                t1s += -0.5 * Lam
                t2s += Lam @ mu
                t3s += -0.5 * mu @ Lam @ mu
                t4s += -0.5 * np.linalg.slogdet(Sigma)[1]
            break  # 1000 samples is enough with loose tolerance
        n_used = 1000
        stats = niw.expectedstats(self.nat)
        np.testing.assert_allclose(t1s / n_used, stats[0], rtol=0.15, atol=0.05)
        np.testing.assert_allclose(t2s / n_used, stats[1], rtol=0.2, atol=0.1)
        np.testing.assert_allclose(t3s / n_used, stats[2], rtol=0.2)
        np.testing.assert_allclose(t4s / n_used, stats[3], rtol=0.3, atol=0.1)

    def test_batched(self):
        nats = jax.tree.map(lambda x: jnp.stack([x, x]), self.nat)
        stats = niw.expectedstats(nats)
        single = niw.expectedstats(self.nat)
        assert_trees_close(jax.tree.map(lambda s: s[0], stats), single, rtol=1e-6)


# ---------------------------------------------------------------- mniw


class TestMNIW:
    def setup_method(self):
        key = jax.random.PRNGKey(3)
        k1, k2, k3 = jax.random.split(key, 3)
        self.d, self.n = 3, 4
        self.Phi = rand_psd(k1, self.d)
        self.M = 0.3 * jax.random.normal(k2, (self.d, self.n))
        self.V = rand_psd(k3, self.n)
        self.nu = jnp.asarray(self.d + 3.0)
        self.nat = mniw.standard_to_natural(self.Phi, self.M, self.V, self.nu)

    def test_roundtrip(self):
        Phi, M, V, nu = mniw.natural_to_standard(self.nat)
        assert_trees_close(
            (Phi, M, V, nu), (self.Phi, self.M, self.V, self.nu), rtol=1e-5
        )

    def test_expectedstats_is_grad_logZ(self):
        grad_stats = jax.grad(mniw.logZ)(self.nat)
        stats = mniw.expectedstats(self.nat)
        sym = lambda m: 0.5 * (m + m.T)
        assert_trees_close(sym(grad_stats[0]), stats[0], rtol=1e-5)
        assert_trees_close(grad_stats[1], stats[1], rtol=1e-5)
        assert_trees_close(sym(grad_stats[2]), stats[2], rtol=1e-5)
        np.testing.assert_allclose(grad_stats[3], stats[3], rtol=1e-5)

    def test_expectedstats_monte_carlo(self):
        rng = np.random.default_rng(1)
        d, n = self.d, self.n
        nu = float(self.nu)
        Phi = np.asarray(self.Phi)
        V = np.asarray(self.V)
        M = np.asarray(self.M)
        N = 8000
        acc = [np.zeros((d, d)), np.zeros((d, n)), np.zeros((n, n)), 0.0]
        Phi_inv_chol = np.linalg.cholesky(np.linalg.inv(Phi))
        V_chol = np.linalg.cholesky(V)
        for _ in range(N):
            A_b = np.tril(rng.standard_normal((d, d)), -1)
            A_b[np.diag_indices(d)] = np.sqrt(rng.chisquare(nu - np.arange(d)))
            W = Phi_inv_chol @ A_b
            Lam = W @ W.T
            Sigma = np.linalg.inv(Lam)
            Sig_chol = np.linalg.cholesky(Sigma)
            A = M + Sig_chol @ rng.standard_normal((d, n)) @ V_chol.T
            acc[0] += -0.5 * Lam
            acc[1] += Lam @ A
            acc[2] += -0.5 * A.T @ Lam @ A
            acc[3] += -0.5 * np.linalg.slogdet(Sigma)[1]
        stats = mniw.expectedstats(self.nat)
        np.testing.assert_allclose(acc[0] / N, stats[0], rtol=0.15, atol=0.05)
        np.testing.assert_allclose(acc[1] / N, stats[1], rtol=0.5, atol=0.25)
        np.testing.assert_allclose(acc[2] / N, stats[2], rtol=0.2, atol=0.4)
        np.testing.assert_allclose(acc[3] / N, stats[3], rtol=0.3, atol=0.1)


# ---------------------------------------------------------------- dirichlet


class TestDirichlet:
    def test_expectedstats_is_grad_logZ(self):
        alpha = jnp.array([0.7, 1.3, 2.0, 5.0])
        nat = dirichlet.standard_to_natural(alpha)
        np.testing.assert_allclose(
            jax.grad(dirichlet.logZ)(nat), dirichlet.expectedstats(nat), rtol=1e-6
        )

    def test_expected_logpi_monte_carlo(self):
        alpha = np.array([0.7, 1.3, 2.0, 5.0])
        rng = np.random.default_rng(0)
        pis = rng.dirichlet(alpha, size=200_000)
        emp = np.log(pis).mean(0)
        nat = dirichlet.standard_to_natural(jnp.asarray(alpha))
        np.testing.assert_allclose(emp, dirichlet.expectedstats(nat), atol=2e-2)

    def test_batched_rows(self):
        alpha = jnp.array([[1.0, 2.0], [3.0, 4.0]])
        nat = dirichlet.standard_to_natural(alpha)
        stats = dirichlet.expectedstats(nat)
        assert stats.shape == (2, 2)
        np.testing.assert_allclose(
            jax.grad(dirichlet.logZ)(nat), stats, rtol=1e-6
        )


# ---------------------------------------------------------------- categorical


class TestCategorical:
    def test_expectedstats_is_grad_logZ(self):
        eta = jnp.array([0.3, -1.2, 2.0])
        np.testing.assert_allclose(
            jax.grad(categorical.logZ)(eta), categorical.expectedstats(eta), rtol=1e-6
        )

    def test_normalization(self):
        eta = jnp.array([[0.3, -1.2, 2.0], [0.0, 0.0, 0.0]])
        p = categorical.expectedstats(eta)
        np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-6)
