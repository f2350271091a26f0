"""HMM associative-scan kernel vs brute-force / sequential oracles, plus the
grad(logZ) = marginals contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svae_tpu.ops import hmm, oracles
from tests.test_oracles import TestHMMOracles


def make_hmm(T=6, K=3, seed=0, time_varying=False):
    return TestHMMOracles().make_hmm(T=T, K=K, seed=seed, time_varying=time_varying)


@pytest.fixture(params=[True, False], ids=["parallel", "sequential"])
def parallel(request):
    return request.param


class TestLogZ:
    def test_matches_brute_force(self, parallel):
        args = make_hmm(T=6, K=3, seed=0)
        want = oracles.hmm_logZ_brute(*args)
        got = hmm.hmm_logZ(*jax.tree.map(jnp.asarray, args), parallel=parallel)
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_time_varying(self, parallel):
        args = make_hmm(T=5, K=3, seed=1, time_varying=True)
        want = oracles.hmm_logZ_brute(*args)
        got = hmm.hmm_logZ(*jax.tree.map(jnp.asarray, args), parallel=parallel)
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_long_chain_vs_seq_oracle(self, parallel):
        args = make_hmm(T=300, K=5, seed=2)
        want = oracles.hmm_logZ_seq(*args)
        got = hmm.hmm_logZ(*jax.tree.map(jnp.asarray, args), parallel=parallel)
        np.testing.assert_allclose(got, want, rtol=1e-9)

    def test_batched_vmap(self):
        probs = [make_hmm(T=8, K=3, seed=s) for s in (3, 4, 5)]
        batch = jax.tree.map(lambda *xs: jnp.stack(xs), *jax.tree.map(jnp.asarray, probs))
        got = jax.jit(jax.vmap(hmm.hmm_logZ))(*batch)
        want = np.array([oracles.hmm_logZ_seq(*p) for p in probs])
        np.testing.assert_allclose(got, want, rtol=1e-9)

    def test_K1_degenerate(self, parallel):
        lo = jnp.ones((5, 1))
        got = hmm.hmm_logZ(jnp.zeros(1), jnp.zeros((1, 1)), lo, parallel=parallel)
        np.testing.assert_allclose(got, 5.0, rtol=1e-12)


class TestMarginals:
    def test_node_marginals_match_oracle(self, parallel):
        args = make_hmm(T=9, K=4, seed=6)
        logZ_o, node_o, pair_o = oracles.hmm_marginals_seq(*args)
        jargs = jax.tree.map(jnp.asarray, args)
        logZ, node, trans_stats, init_marg = hmm.hmm_marginals(
            *jargs, parallel=parallel
        )
        np.testing.assert_allclose(logZ, logZ_o, rtol=1e-10)
        np.testing.assert_allclose(node, node_o, rtol=1e-8, atol=1e-12)
        # homogeneous log_trans: grad sums pairwise marginals over time
        np.testing.assert_allclose(trans_stats, pair_o.sum(0), rtol=1e-8, atol=1e-12)
        np.testing.assert_allclose(init_marg, node_o[0], rtol=1e-8, atol=1e-12)

    def test_pair_marginals_time_varying(self, parallel):
        args = make_hmm(T=6, K=3, seed=7, time_varying=True)
        _, node_o, pair_o = oracles.hmm_marginals_seq(*args)
        jargs = jax.tree.map(jnp.asarray, args)
        _, node, pair, _ = hmm.hmm_marginals(*jargs, parallel=parallel)
        np.testing.assert_allclose(node, node_o, rtol=1e-8, atol=1e-12)
        np.testing.assert_allclose(pair, pair_o, rtol=1e-8, atol=1e-12)


class TestSample:
    def test_path_frequencies_match_posterior(self, parallel):
        # tiny chain: empirical path histogram vs exact path posterior
        args = make_hmm(T=3, K=2, seed=8)
        jargs = jax.tree.map(jnp.asarray, args)
        zs = hmm.hmm_sample(
            *jargs, key=jax.random.PRNGKey(0), num_samples=40_000, parallel=parallel
        )
        assert zs.shape == (40_000, 3)
        log_init, log_trans, log_obs = args
        import itertools

        freq = {}
        for path in itertools.product(range(2), repeat=3):
            lp = log_init[path[0]] + log_obs[0, path[0]]
            for t in range(1, 3):
                lp += log_trans[path[t - 1], path[t]] + log_obs[t, path[t]]
            freq[path] = np.exp(lp)
        Z = sum(freq.values())
        zs_np = np.asarray(zs)
        for path, p in freq.items():
            emp = np.mean(np.all(zs_np == np.array(path), axis=-1))
            np.testing.assert_allclose(emp, p / Z, atol=0.02)


def test_hmm_posterior_matches_grad_marginals():
    """hmm_posterior (direct alpha/beta scans) must equal hmm_marginals
    (grad of logZ) -- the two routes to the same expectations."""
    from svae_tpu.ops import hmm as hmm_mod

    rng = np.random.RandomState(7)
    T, K = 12, 4
    log_init = np.log(rng.dirichlet(np.ones(K)))
    log_trans = np.log(rng.dirichlet(np.ones(K), size=K))
    log_obs = rng.randn(T, K)
    for par in (True, False):
        lz_g, node_g, pair_g, r1_g = hmm_mod.hmm_marginals(
            jnp.asarray(log_init), jnp.asarray(log_trans),
            jnp.asarray(log_obs), parallel=par)
        lz_d, node_d, pair_d, r1_d = hmm_mod.hmm_posterior(
            jnp.asarray(log_init), jnp.asarray(log_trans),
            jnp.asarray(log_obs), parallel=par)
        np.testing.assert_allclose(float(lz_d), float(lz_g), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(node_d), np.asarray(node_g),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(pair_d), np.asarray(pair_g),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(r1_d), np.asarray(r1_g),
                                   atol=1e-10)


class TestViterbi:
    def _brute(self, log_init, log_trans, log_obs):
        import itertools
        T, K = log_obs.shape
        li, lt, lo = (np.asarray(x) for x in (log_init, log_trans, log_obs))
        tv = lt.ndim == 3
        best, best_path = -np.inf, None
        for path in itertools.product(range(K), repeat=T):
            s = li[path[0]] + lo[0, path[0]]
            for t in range(T - 1):
                A = lt[t] if tv else lt
                s += A[path[t], path[t + 1]] + lo[t + 1, path[t + 1]]
            if s > best:
                best, best_path = s, path
        return np.array(best_path), best

    def test_matches_brute_force(self, parallel):
        args = make_hmm(T=6, K=3, seed=0)
        want_path, want_score = self._brute(*args)
        path, score = hmm.hmm_viterbi(*args, parallel=parallel)
        np.testing.assert_allclose(float(score), want_score, rtol=1e-10)
        np.testing.assert_array_equal(np.asarray(path), want_path)

    def test_time_varying(self, parallel):
        args = make_hmm(T=5, K=3, seed=3, time_varying=True)
        want_path, want_score = self._brute(*args)
        path, score = hmm.hmm_viterbi(*args, parallel=parallel)
        np.testing.assert_allclose(float(score), want_score, rtol=1e-10)
        np.testing.assert_array_equal(np.asarray(path), want_path)

    def test_path_achieves_score(self, parallel):
        """On a bigger chain (no brute force): the returned path's joint
        log-potential equals the returned score, and beats random paths."""
        li, lt, lo = make_hmm(T=40, K=4, seed=1)
        path, score = hmm.hmm_viterbi(li, lt, lo, parallel=parallel)
        p = np.asarray(path)
        s = float(li[p[0]] + lo[0, p[0]])
        for t in range(len(p) - 1):
            s += float(lt[p[t], p[t + 1]] + lo[t + 1, p[t + 1]])
        np.testing.assert_allclose(s, float(score), rtol=1e-6)
        rng = np.random.RandomState(0)
        for _ in range(20):
            q = rng.randint(0, 4, size=len(p))
            sq = float(li[q[0]] + lo[0, q[0]])
            for t in range(len(q) - 1):
                sq += float(lt[q[t], q[t + 1]] + lo[t + 1, q[t + 1]])
            assert sq <= s + 1e-9
