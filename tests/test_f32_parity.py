"""f32 parity protocol (SURVEY.md section 7 hard parts 1 & 5): the
production TPU path runs f32; these tests pin the f32 kernel outputs
against the f64 oracles with explicit tolerance tiers, on CPU (same
arithmetic semantics as TPU under full-f32 matmul precision, which the
kernels pin via f32_linalg)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svae_tpu.ops import kalman, oracles
from svae_tpu.models import lds

# tolerance tiers for T=100 chained f32 Schur complements
TOL_LOGZ_REL = 2e-4
TOL_MOMENT_ABS = 2e-3


def _chain(T=100, d=8, seed=0):
    rng = np.random.RandomState(seed)
    A = 0.9 * np.linalg.qr(rng.randn(d, d))[0]
    Qi = np.linalg.inv(0.1 * np.eye(d))
    init = (-0.5 * np.eye(d), np.zeros(d), 0.0)
    pairs = (
        np.tile(-0.5 * Qi, (T - 1, 1, 1)),
        np.tile(Qi @ A, (T - 1, 1, 1)),
        np.tile(-0.5 * A.T @ Qi @ A, (T - 1, 1, 1)),
        np.zeros(T - 1),
    )
    J = np.abs(rng.randn(T, d)) + 0.5
    nodes = (
        np.stack([-0.5 * np.diag(J[t]) for t in range(T)]),
        rng.randn(T, d).astype(np.float64),
    )
    return init, pairs, nodes


@pytest.mark.parametrize("parallel", [False, True])
def test_f32_smoother_matches_f64_oracle(parallel):
    init, pairs, nodes = _chain()
    logZ_o, Ex_o, ExxT_o, _ = oracles.lds_smoother_seq(init, pairs, nodes)
    f32 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32),
                       (init, pairs, nodes))
    logZ, Ex, ExxT, _ = kalman.lds_smoother(*f32, parallel=parallel)
    assert abs(float(logZ) - logZ_o) / abs(logZ_o) < TOL_LOGZ_REL
    assert float(jnp.max(jnp.abs(Ex - Ex_o))) < TOL_MOMENT_ABS
    assert float(jnp.max(jnp.abs(ExxT - ExxT_o))) < TOL_MOMENT_ABS


def test_f32_elbo_matches_f64_within_tolerance():
    """Same LDS model ELBO evaluated in f32 vs f64 (identical PRNG):
    the matched-ELBO protocol's float-tolerance tier."""
    d, T, B = 4, 30, 6
    key = jax.random.PRNGKey(0)
    glob64 = lds.init_pgm_param(key, d, dtype=jnp.float64)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    J = jax.nn.softplus(jax.random.normal(k1, (B, T, d), jnp.float64)) + 0.5
    h = jax.random.normal(k2, (B, T, d), jnp.float64)

    _, stats64, gkl64, lkl64 = lds.run_inference(
        glob64, glob64, (J, h), jax.random.PRNGKey(2), 1)
    glob32 = jax.tree.map(lambda a: a.astype(jnp.float32), glob64)
    _, stats32, gkl32, lkl32 = lds.run_inference(
        glob32, glob32, (J.astype(jnp.float32), h.astype(jnp.float32)),
        jax.random.PRNGKey(2), 1)
    assert abs(float(lkl32) - float(lkl64)) / abs(float(lkl64)) < 1e-3
    assert abs(float(gkl32) - float(gkl64)) < 1e-2 * max(
        1.0, abs(float(gkl64)))
    for a, b in zip(jax.tree.leaves(stats32), jax.tree.leaves(stats64)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2,
                                   atol=2e-3)
