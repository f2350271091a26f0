"""Parity tests: native C++ sequential kernels vs the NumPy f64 oracles
(the dual-implementation strategy of SURVEY.md section 4, with the C++
library playing the reference's Cython role)."""

import numpy as np
import pytest

from svae_tpu.ops import oracles
from svae_tpu.ops import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def _rand_chain(T=11, d=3, seed=0):
    rng = np.random.RandomState(seed)
    def spd(scale=1.0):
        G = rng.randn(d, d)
        return scale * (G @ G.T + d * np.eye(d))
    A = rng.randn(d, d) * 0.5
    Qi = spd(0.5)
    I1 = -0.5 * spd(1.0)
    I2 = rng.randn(d)
    Ic = float(rng.randn())
    P1 = np.tile(-0.5 * Qi, (T - 1, 1, 1))
    P2 = np.tile(Qi @ A, (T - 1, 1, 1))
    P3 = np.tile(-0.5 * A.T @ Qi @ A - 0.05 * np.eye(d), (T - 1, 1, 1))
    Pc = rng.randn(T - 1)
    N1 = np.stack([-0.5 * spd(0.3) for _ in range(T)])
    N2 = rng.randn(T, d)
    return (I1, I2, Ic), (P1, P2, P3, Pc), (N1, N2)


def test_filter_matches_oracle():
    init, pairs, nodes = _rand_chain()
    lz_o, Jf_o, hf_o = oracles.lds_filter_seq(init, pairs, nodes)
    lz_n, Jf_n, hf_n = native.lds_filter_seq(init, pairs, nodes)
    np.testing.assert_allclose(lz_n, lz_o, rtol=1e-12)
    np.testing.assert_allclose(Jf_n, Jf_o, atol=1e-10)
    np.testing.assert_allclose(hf_n, hf_o, atol=1e-10)


def test_smoother_matches_oracle():
    init, pairs, nodes = _rand_chain(T=9, d=4, seed=3)
    o = oracles.lds_smoother_seq(init, pairs, nodes)
    n = native.lds_smoother_seq(init, pairs, nodes)
    np.testing.assert_allclose(n[0], o[0], rtol=1e-12)
    for a, b in zip(n[1:], o[1:]):
        np.testing.assert_allclose(a, b, atol=1e-9)


def test_sampler_matches_oracle():
    init, pairs, nodes = _rand_chain(T=7, d=2, seed=5)
    rng = np.random.RandomState(11)
    eps = rng.randn(7, 2)
    x_o = oracles.lds_sample_seq(init, pairs, nodes, eps)
    x_n = native.lds_sample_seq(init, pairs, nodes, eps)
    np.testing.assert_allclose(x_n, x_o, atol=1e-10)


def test_hmm_matches_oracle():
    rng = np.random.RandomState(2)
    T, K = 13, 4
    log_init = np.log(rng.dirichlet(np.ones(K)))
    log_trans = np.log(rng.dirichlet(np.ones(K), size=K))
    log_obs = rng.randn(T, K)
    lz_o, node_o, pair_o = oracles.hmm_marginals_seq(log_init, log_trans,
                                                     log_obs)
    lz_n, node_n, pair_n = native.hmm_marginals_seq(log_init, log_trans,
                                                    log_obs)
    np.testing.assert_allclose(lz_n, lz_o, rtol=1e-12)
    np.testing.assert_allclose(node_n, node_o, atol=1e-12)
    np.testing.assert_allclose(pair_n, pair_o.sum(0), atol=1e-12)
