"""Oracle self-consistency: the O(T) sequential NumPy implementations must
match brute force (dense Td x Td joint Gaussian for the LDS; K^T path
enumeration for the HMM) -- the classic test style of the reference
(SURVEY.md section 4, brute-force enumeration bullet)."""

import numpy as np
import pytest

from svae_tpu.ops import oracles


def make_lds_potentials(T=12, d=3, seed=0, node_scale=1.0, time_varying=False):
    """Random potentials built generatively from a stable LDS so the joint is
    guaranteed PD: pair = N(x'|Ax, Q) in natural form, init = N(mu0, S0),
    nodes = diagonal evidence potentials."""
    rng = np.random.default_rng(seed)

    def rand_psd(k):
        a = rng.standard_normal((k, k))
        return a @ a.T + k * np.eye(k)

    n_pair = T - 1
    P1 = np.zeros((n_pair, d, d))
    P2 = np.zeros((n_pair, d, d))
    P3 = np.zeros((n_pair, d, d))
    Pc = np.zeros(n_pair)
    for t in range(n_pair):
        if t == 0 or time_varying:
            A = rng.standard_normal((d, d))
            A *= 0.9 / max(1e-6, np.max(np.abs(np.linalg.eigvals(A))))
            Q = rand_psd(d)
            Qi = np.linalg.inv(Q)
        P1[t] = -0.5 * Qi
        P2[t] = Qi @ A
        P3[t] = -0.5 * A.T @ Qi @ A
        Pc[t] = -0.5 * np.linalg.slogdet(2 * np.pi * Q)[1]
    S0 = rand_psd(d)
    mu0 = rng.standard_normal(d)
    S0i = np.linalg.inv(S0)
    init = (
        -0.5 * S0i,
        S0i @ mu0,
        -0.5 * mu0 @ S0i @ mu0 - 0.5 * np.linalg.slogdet(2 * np.pi * S0)[1],
    )
    jn = node_scale * rng.uniform(0.2, 2.0, size=(T, d))
    hn = node_scale * rng.standard_normal((T, d))
    N1 = np.stack([-0.5 * np.diag(j) for j in jn])
    nodes = (N1, hn)
    return init, (P1, P2, P3, Pc), nodes


class TestLDSOracles:
    def test_filter_logZ_matches_dense(self):
        init, pairs, nodes = make_lds_potentials(T=10, d=3, seed=0)
        logZ_dense = oracles.lds_logZ_dense(init, pairs, nodes)
        logZ_seq, _, _ = oracles.lds_filter_seq(init, pairs, nodes)
        np.testing.assert_allclose(logZ_seq, logZ_dense, rtol=1e-10)

    def test_filter_logZ_time_varying(self):
        init, pairs, nodes = make_lds_potentials(T=8, d=2, seed=1, time_varying=True)
        np.testing.assert_allclose(
            oracles.lds_filter_seq(init, pairs, nodes)[0],
            oracles.lds_logZ_dense(init, pairs, nodes),
            rtol=1e-10,
        )

    def test_normalized_chain_logZ_is_zero(self):
        # with zero node potentials the chain is an actual normalized LDS
        init, pairs, nodes = make_lds_potentials(T=15, d=3, seed=2, node_scale=0.0)
        N1, N2 = np.zeros_like(nodes[0]), np.zeros_like(nodes[1])
        logZ, _, _ = oracles.lds_filter_seq(init, pairs, (N1, N2))
        np.testing.assert_allclose(logZ, 0.0, atol=1e-9)

    def test_smoother_matches_dense_moments(self):
        init, pairs, nodes = make_lds_potentials(T=9, d=3, seed=3)
        Ex_d, ExxT_d, Exnxt_d = oracles.lds_moments_dense(init, pairs, nodes)
        logZ, Ex, ExxT, Exnxt = oracles.lds_smoother_seq(init, pairs, nodes)
        np.testing.assert_allclose(Ex, Ex_d, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(ExxT, ExxT_d, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(Exnxt, Exnxt_d, rtol=1e-8, atol=1e-10)

    def test_sampler_moments(self):
        init, pairs, nodes = make_lds_potentials(T=6, d=2, seed=4)
        Ex_d, ExxT_d, Exnxt_d = oracles.lds_moments_dense(init, pairs, nodes)
        rng = np.random.default_rng(0)
        n = 20_000
        xs = np.stack(
            [
                oracles.lds_sample_seq(
                    init, pairs, nodes, rng.standard_normal((6, 2))
                )
                for _ in range(n)
            ]
        )
        np.testing.assert_allclose(xs.mean(0), Ex_d, atol=3e-2)
        emp_ExxT = np.einsum("sti,stj->tij", xs, xs) / n
        np.testing.assert_allclose(emp_ExxT, ExxT_d, atol=5e-2)
        emp_cross = np.einsum("sti,stj->tij", xs[:, :-1], xs[:, 1:]) / n
        np.testing.assert_allclose(emp_cross, Exnxt_d, atol=5e-2)


class TestHMMOracles:
    def make_hmm(self, T=6, K=3, seed=0, time_varying=False):
        rng = np.random.default_rng(seed)
        log_init = np.log(rng.dirichlet(np.ones(K)))
        if time_varying:
            log_trans = np.log(
                np.stack([rng.dirichlet(np.ones(K), size=K) for _ in range(T - 1)])
            )
        else:
            log_trans = np.log(rng.dirichlet(np.ones(K), size=K))
        log_obs = rng.standard_normal((T, K))
        return log_init, log_trans, log_obs

    def test_logZ_matches_brute_force(self):
        args = self.make_hmm(T=6, K=3, seed=0)
        np.testing.assert_allclose(
            oracles.hmm_logZ_seq(*args), oracles.hmm_logZ_brute(*args), rtol=1e-12
        )

    def test_logZ_time_varying(self):
        args = self.make_hmm(T=5, K=3, seed=1, time_varying=True)
        np.testing.assert_allclose(
            oracles.hmm_logZ_seq(*args), oracles.hmm_logZ_brute(*args), rtol=1e-12
        )

    def test_marginals_normalize_and_are_consistent(self):
        args = self.make_hmm(T=7, K=4, seed=2)
        logZ, node, pair = oracles.hmm_marginals_seq(*args)
        np.testing.assert_allclose(oracles.hmm_logZ_seq(*args), logZ, rtol=1e-12)
        np.testing.assert_allclose(node.sum(-1), 1.0, rtol=1e-10)
        np.testing.assert_allclose(pair.sum((-1, -2)), 1.0, rtol=1e-10)
        # pairwise marginals must be consistent with node marginals
        np.testing.assert_allclose(pair.sum(-1), node[:-1], rtol=1e-9)
        np.testing.assert_allclose(pair.sum(-2), node[1:], rtol=1e-9)

    def test_marginals_vs_brute_force(self):
        log_init, log_trans, log_obs = self.make_hmm(T=5, K=2, seed=3)
        import itertools

        T, K = log_obs.shape
        node_bf = np.zeros((T, K))
        Z = 0.0
        for path in itertools.product(range(K), repeat=T):
            lp = log_init[path[0]] + log_obs[0, path[0]]
            for t in range(1, T):
                lp += log_trans[path[t - 1], path[t]] + log_obs[t, path[t]]
            p = np.exp(lp)
            Z += p
            for t in range(T):
                node_bf[t, path[t]] += p
        node_bf /= Z
        _, node, _ = oracles.hmm_marginals_seq(log_init, log_trans, log_obs)
        np.testing.assert_allclose(node, node_bf, rtol=1e-9)
