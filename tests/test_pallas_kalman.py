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
