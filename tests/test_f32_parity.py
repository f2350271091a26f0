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


def test_f32_ragged_padding_theorem_lds_and_slds():
    """The ragged-batch exactness theorem holds at f32 (the production
    dtype): padded stats/local-KL track the unpadded ones at f32 reduction
    tolerance on both model families (XLA backend; the on-chip gate
    re-checks the Pallas backend in benchmarks/onchip_parity.py)."""
    from svae_tpu.models import lds, slds

    rng = np.random.RandomState(7)
    d, T1, T2 = 3, 6, 10
    Jb = (np.log1p(np.exp(rng.randn(2, T2, d))) + 0.4).astype(np.float32)
    hb = rng.randn(2, T2, d).astype(np.float32)
    Jb32, hb32 = jnp.asarray(Jb), jnp.asarray(hb)
    key = jax.random.PRNGKey(0)
    lengths = jnp.array([T1, T2])

    glob = jax.tree.map(lambda a: a.astype(jnp.float32),
                        lds.init_pgm_param(jax.random.PRNGKey(1), d,
                                           dtype=jnp.float64))
    outs = [lds.run_inference(glob, glob, (Jb32[:1, :T1], hb32[:1, :T1]),
                              key, 1),
            lds.run_inference(glob, glob, (Jb32[1:], hb32[1:]), key, 1)]
    stats_ref = jax.tree.map(lambda a, b: a + b, outs[0][1], outs[1][1])
    _, stats_pad, _, lkl_pad = lds.run_inference(
        glob, glob, (Jb32, hb32), key, 1, lengths=lengths)
    lkl_ref = outs[0][3] + outs[1][3]
    for a, b in zip(jax.tree.leaves(stats_pad), jax.tree.leaves(stats_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(lkl_pad), float(lkl_ref), rtol=2e-4)

    K = 2
    sglob = jax.tree.map(
        lambda a: a.astype(jnp.float32),
        slds.init_pgm_param(jax.random.PRNGKey(2), K, d))
    mf = dict(num_samples=1, num_meanfield_iters=2, num_diff_iters=1)
    souts = [slds.run_inference(sglob, sglob,
                                (Jb32[:1, :T1], hb32[:1, :T1]), key, **mf),
             slds.run_inference(sglob, sglob, (Jb32[1:], hb32[1:]), key,
                                **mf)]
    sstats_ref = jax.tree.map(lambda a, b: a + b, souts[0][1], souts[1][1])
    _, sstats_pad, _, slkl_pad = slds.run_inference(
        sglob, sglob, (Jb32, hb32), key, lengths=lengths, **mf)
    slkl_ref = souts[0][3] + souts[1][3]
    for a, b in zip(jax.tree.leaves(sstats_pad),
                    jax.tree.leaves(sstats_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(float(slkl_pad), float(slkl_ref), rtol=5e-4)
