"""Pallas filter kernel vs the XLA scan filter, run in Pallas interpreter
mode so it works on the CPU test platform (the real-chip run is part of
the verify/bench surface; measured 5.9x over the XLA scan there)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svae_tpu.models import lds
from svae_tpu.ops import kalman
from svae_tpu.ops.pallas_kalman import lds_filter_pallas


@pytest.mark.parametrize("B,T,d", [(4, 6, 3), (3, 9, 2)])
def test_pallas_filter_matches_xla(B, T, d):
    key = jax.random.PRNGKey(0)
    glob = lds.init_pgm_param(key, d)
    init, pairs = lds.expected_chain_potentials(glob, T)
    init = jax.tree.map(lambda a: a.astype(jnp.float32), init)
    pairs = jax.tree.map(lambda a: a.astype(jnp.float32), pairs)
    k1, k2 = jax.random.split(key)
    Jd = jax.nn.softplus(jax.random.normal(k1, (B, T, d), jnp.float32)) + 0.5
    h = jax.random.normal(k2, (B, T, d), jnp.float32)
    N1 = -0.5 * jax.vmap(jax.vmap(jnp.diag))(Jd)

    logZ_p, Jf_p, hf_p = lds_filter_pallas(init, pairs, (N1, h),
                                           interpret=True)
    logZ_x, Jf_x, hf_x = jax.vmap(
        lambda n1, n2: kalman.lds_filter(init, pairs, (n1, n2)))(N1, h)

    np.testing.assert_allclose(np.asarray(logZ_p), np.asarray(logZ_x),
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(Jf_p), np.asarray(Jf_x),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(hf_p), np.asarray(hf_x),
                               atol=2e-5)


def test_pallas_filter_pads_batch():
    key = jax.random.PRNGKey(1)
    d, T, B = 2, 5, 3  # B far from the 128 lane width
    glob = lds.init_pgm_param(key, d)
    init, pairs = lds.expected_chain_potentials(glob, T)
    init = jax.tree.map(lambda a: a.astype(jnp.float32), init)
    pairs = jax.tree.map(lambda a: a.astype(jnp.float32), pairs)
    k1, k2 = jax.random.split(key)
    Jd = jax.nn.softplus(jax.random.normal(k1, (B, T, d), jnp.float32)) + 0.5
    h = jax.random.normal(k2, (B, T, d), jnp.float32)
    N1 = -0.5 * jax.vmap(jax.vmap(jnp.diag))(Jd)
    logZ, Jf, hf = lds_filter_pallas(init, pairs, (N1, h), interpret=True)
    assert logZ.shape == (B,) and Jf.shape == (B, T, d, d)
    assert np.all(np.isfinite(np.asarray(logZ)))


@pytest.mark.parametrize("B,T,d", [(4, 7, 3), (2, 5, 2)])
def test_pallas_smoother_matches_xla(B, T, d):
    from svae_tpu.ops.pallas_kalman import lds_smoother_pallas

    key = jax.random.PRNGKey(2)
    glob = lds.init_pgm_param(key, d)
    init, pairs = lds.expected_chain_potentials(glob, T)
    init = jax.tree.map(lambda a: a.astype(jnp.float32), init)
    pairs = jax.tree.map(lambda a: a.astype(jnp.float32), pairs)
    k1, k2 = jax.random.split(key)
    Jd = jax.nn.softplus(jax.random.normal(k1, (B, T, d), jnp.float32)) + 0.5
    h = jax.random.normal(k2, (B, T, d), jnp.float32)
    N1 = -0.5 * jax.vmap(jax.vmap(jnp.diag))(Jd)

    lZ, Ex, ExxT, Exn = lds_smoother_pallas(init, pairs, (N1, h),
                                            interpret=True)
    lZx, Exx, ExxTx, Exnx = jax.vmap(
        lambda n1, n2: kalman.lds_smoother(init, pairs, (n1, n2)))(N1, h)
    np.testing.assert_allclose(np.asarray(lZ), np.asarray(lZx), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(Ex), np.asarray(Exx), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ExxT), np.asarray(ExxTx),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(Exn), np.asarray(Exnx),
                               atol=2e-5)


def test_pallas_sampler_zero_noise_gives_smoothed_mean():
    """With eps = 0 the backward conditional recursion composes the
    conditional means, whose fixed point is the joint posterior mean --
    an EXACT identity against the smoother (no MC tolerance)."""
    from svae_tpu.ops.pallas_kalman import lds_sample_pallas

    B, T, d, S = 3, 7, 3, 2
    key = jax.random.PRNGKey(4)
    glob = lds.init_pgm_param(key, d)
    init, pairs = lds.expected_chain_potentials(glob, T)
    init = jax.tree.map(lambda a: a.astype(jnp.float32), init)
    pairs = jax.tree.map(lambda a: a.astype(jnp.float32), pairs)
    k1, k2 = jax.random.split(key)
    Jd = jax.nn.softplus(jax.random.normal(k1, (B, T, d), jnp.float32)) + 0.5
    h = jax.random.normal(k2, (B, T, d), jnp.float32)
    N1 = -0.5 * jax.vmap(jax.vmap(jnp.diag))(Jd)

    xs = lds_sample_pallas(init, pairs, (N1, h), jax.random.PRNGKey(0), S,
                           interpret=True,
                           eps=jnp.zeros((S, B, T, d), jnp.float32))
    _, Ex, _, _ = jax.vmap(
        lambda n1, n2: kalman.lds_smoother(init, pairs, (n1, n2)))(N1, h)
    for s_i in range(S):
        np.testing.assert_allclose(np.asarray(xs[s_i]), np.asarray(Ex),
                                   atol=3e-5)


def test_pallas_sampler_statistics():
    from svae_tpu.ops.pallas_kalman import lds_sample_pallas

    B, T, d = 2, 5, 2
    key = jax.random.PRNGKey(5)
    glob = lds.init_pgm_param(key, d)
    init, pairs = lds.expected_chain_potentials(glob, T)
    init = jax.tree.map(lambda a: a.astype(jnp.float32), init)
    pairs = jax.tree.map(lambda a: a.astype(jnp.float32), pairs)
    k1, k2 = jax.random.split(key)
    Jd = jax.nn.softplus(jax.random.normal(k1, (B, T, d), jnp.float32)) + 0.5
    h = jax.random.normal(k2, (B, T, d), jnp.float32)
    N1 = -0.5 * jax.vmap(jax.vmap(jnp.diag))(Jd)
    S = 512
    xs = lds_sample_pallas(init, pairs, (N1, h), jax.random.PRNGKey(1), S,
                           interpret=True)
    _, Ex, ExxT, _ = jax.vmap(
        lambda n1, n2: kalman.lds_smoother(init, pairs, (n1, n2)))(N1, h)
    emp = jnp.mean(xs, axis=0)
    # 4-sigma MC band on the mean estimate
    sd = jnp.sqrt(jnp.maximum(
        jax.vmap(jnp.diagonal)(
            (ExxT - Ex[..., :, None] * Ex[..., None, :]).reshape(
                -1, d, d)).reshape(B, T, d), 1e-8))
    assert bool(jnp.all(jnp.abs(emp - Ex) < 4.0 * sd / np.sqrt(S)))


def test_pallas_estep_composition():
    from svae_tpu.ops.pallas_kalman import lds_estep_pallas

    B, T, d, S = 2, 6, 2, 3
    key = jax.random.PRNGKey(6)
    glob = lds.init_pgm_param(key, d)
    init, pairs = lds.expected_chain_potentials(glob, T)
    init = jax.tree.map(lambda a: a.astype(jnp.float32), init)
    pairs = jax.tree.map(lambda a: a.astype(jnp.float32), pairs)
    k1, k2 = jax.random.split(key)
    Jd = jax.nn.softplus(jax.random.normal(k1, (B, T, d), jnp.float32)) + 0.5
    h = jax.random.normal(k2, (B, T, d), jnp.float32)
    N1 = -0.5 * jax.vmap(jax.vmap(jnp.diag))(Jd)
    samples, (Ex, ExxT, Exn), logZ = lds_estep_pallas(
        init, pairs, (N1, h), jax.random.PRNGKey(0), S, interpret=True)
    assert samples.shape == (S, B, T, d)
    lZx, Exx, _, _ = jax.vmap(
        lambda n1, n2: kalman.lds_smoother(init, pairs, (n1, n2)))(N1, h)
    np.testing.assert_allclose(np.asarray(logZ), np.asarray(lZx), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(Ex), np.asarray(Exx), atol=2e-5)


def test_pallas_filter_bpairs_matches_xla():
    """Per-sequence pair potentials (the SLDS averaged-pairs layout)."""
    from svae_tpu.ops.pallas_kalman import lds_filter_pallas_bpairs

    B, T, d = 3, 6, 2
    key = jax.random.PRNGKey(7)
    glob = lds.init_pgm_param(key, d)
    init, pairs_sh = lds.expected_chain_potentials(glob, T)
    init = jax.tree.map(lambda a: a.astype(jnp.float32), init)
    pairs_sh = jax.tree.map(lambda a: a.astype(jnp.float32), pairs_sh)
    # perturb pairs per sequence (keeping definiteness)
    ks = jax.random.split(key, 4)
    scale = (1.0 + 0.2 * jax.random.uniform(ks[0], (B, 1, 1, 1))).astype(
        jnp.float32)
    P1 = pairs_sh[0][None] * scale
    P2 = pairs_sh[1][None] * jnp.ones((B, 1, 1, 1), jnp.float32)
    P3 = pairs_sh[2][None] * scale
    Pc = jnp.broadcast_to(pairs_sh[3][None], (B, T - 1)).astype(jnp.float32)
    k1, k2 = jax.random.split(ks[1])
    Jd = jax.nn.softplus(jax.random.normal(k1, (B, T, d), jnp.float32)) + 0.5
    h = jax.random.normal(k2, (B, T, d), jnp.float32)
    N1 = -0.5 * jax.vmap(jax.vmap(jnp.diag))(Jd)

    logZ_p, Jf_p, hf_p = lds_filter_pallas_bpairs(
        init, (P1, P2, P3, Pc), (N1, h), interpret=True)
    logZ_x, Jf_x, hf_x = jax.vmap(
        lambda p1, p2, p3, pc, n1, n2: kalman.lds_filter(
            init, (p1, p2, p3, pc), (n1, n2)))(P1, P2, P3, Pc, N1, h)
    np.testing.assert_allclose(np.asarray(logZ_p), np.asarray(logZ_x),
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(Jf_p), np.asarray(Jf_x),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(hf_p), np.asarray(hf_x),
                               atol=2e-5)
