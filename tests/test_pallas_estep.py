"""Parity tests for the fully packed stationary-diagonal E-step
(ops/pallas_estep.py) against the generic fused-kernel batched path
(models.lds._batched_inference_pallas, itself oracle-verified): reduced
stats, local KL, samples under a shared noise override, and gradients
through every differentiable input (init, pair matrices, diagonal node
potentials)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svae_tpu.models import lds
from svae_tpu.ops import pallas_estep


def _problem(key, B, T, d, dtype=jnp.float64):
    ks = jax.random.split(key, 6)
    glob = lds.init_pgm_param(ks[0], d, dtype=dtype)
    init, pairs = lds.expected_chain_potentials(glob, T, dtype=dtype)
    from svae_tpu.expfam import mniw
    E1, E2, E3, Pc = (a.astype(dtype)
                      for a in mniw.expected_pair_potential(glob[1]))
    jd = jax.nn.softplus(jax.random.normal(ks[1], (B, T, d), dtype)) + 0.4
    h = jax.random.normal(ks[2], (B, T, d), dtype)
    eps = jax.random.normal(ks[3], (2, B, T, d), dtype)
    return init, pairs, (E1, E2, E3, Pc), (jd, h), eps


def _generic(init, pairs, jd, h, key, eps):
    """Generic batched pallas path with the same eps (reduced contract)."""
    from svae_tpu.ops import pallas_vjp

    N1 = -0.5 * jnp.vectorize(jnp.diag, signature="(d)->(d,d)")(jd)
    nodes = (N1, h)
    S = eps.shape[0]
    logZ, Jf, hf, Jb, hb = pallas_vjp.fb_pass(init, pairs, nodes,
                                              block_b=8, interpret=True)
    Ex, ExxT, Exnxt = pallas_vjp._smoother_assembly(pairs, nodes, Jf, hf,
                                                    Jb, hb)
    samples = pallas_vjp.lds_sample(init, pairs, nodes, None, S,
                                    block_b=8, interpret=True,
                                    filtered=(Jf, hf), eps=eps)
    local_kl = (jnp.sum(N1 * ExxT) + jnp.sum(h * Ex) - jnp.sum(logZ))
    B, T = Ex.shape[0], Ex.shape[1]
    cnt = jnp.asarray(B, Ex.dtype)
    niw_stats = (jnp.sum(ExxT[:, 0], axis=0), jnp.sum(Ex[:, 0], axis=0),
                 cnt, cnt)
    ExnxtT = jnp.swapaxes(Exnxt, -1, -2)
    mniw_stats = (jnp.sum(ExxT[:, 1:], axis=(0, 1)),
                  jnp.sum(ExnxtT, axis=(0, 1)),
                  jnp.sum(ExxT[:, :-1], axis=(0, 1)),
                  (T - 1) * cnt)
    return samples, (niw_stats, mniw_stats), local_kl


@pytest.mark.parametrize("B,T", [(3, 7), (4, 6)])
def test_stationary_estep_matches_generic(B, T):
    d = 3
    init, pairs, mats, (jd, h), eps = _problem(jax.random.key(0), B, T, d)
    s_ref, st_ref, kl_ref = _generic(init, pairs, jd, h, None, eps)
    s_new, st_new, kl_new = pallas_estep.lds_estep_stationary(
        init, mats, (jd, h), None, 2, block_b=8, interpret=True, eps=eps)
    np.testing.assert_allclose(float(kl_new), float(kl_ref), rtol=1e-9)
    for r, n in zip(jax.tree.leaves(st_ref), jax.tree.leaves(st_new)):
        np.testing.assert_allclose(np.asarray(n), np.asarray(r),
                                   rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(s_new), np.asarray(s_ref),
                               rtol=1e-8, atol=1e-10)


def test_stationary_estep_grads_match_generic():
    B, T, d = 3, 6, 3
    init, pairs, mats, (jd, h), eps = _problem(jax.random.key(1), B, T, d)
    k = jax.random.split(jax.random.key(2), 8)

    def mk_pairs(mats, T):
        E1, E2, E3, Pc = mats
        b = lambda a: jnp.broadcast_to(a, (T - 1,) + a.shape)
        return (b(E1), b(E2), b(E3), b(Pc))

    def loss_generic(init, mats, jd, h):
        s, (niw, mniw), kl = _generic(init, mk_pairs(mats, T), jd, h,
                                      None, eps)
        return _score(s, niw, mniw, kl, k)

    def loss_new(init, mats, jd, h):
        s, (niw, mniw), kl = pallas_estep.lds_estep_stationary(
            init, mats, (jd, h), None, 2, block_b=8, interpret=True,
            eps=eps)
        return _score(s, niw, mniw, kl, k)

    g_ref = jax.grad(loss_generic, argnums=(0, 1, 2, 3))(init, mats, jd, h)
    g_new = jax.grad(loss_new, argnums=(0, 1, 2, 3))(init, mats, jd, h)
    for r, n in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_new)):
        np.testing.assert_allclose(np.asarray(n), np.asarray(r),
                                   rtol=1e-7, atol=1e-9)


def _score(s, niw, mniw, kl, keys):
    leaves = jax.tree.leaves((s, niw, mniw))
    tot = 2.0 * kl
    for kk, leaf in zip(list(keys) * 3, leaves):
        w = jax.random.normal(kk, jnp.shape(leaf),
                              jnp.result_type(leaf))
        tot = tot + jnp.sum(w * leaf)
    return tot


def test_stationary_estep_unroll_masking():
    """T-1 not a multiple of U exercises tail-pad masking incl. the
    adjoint accumulators."""
    B, T, d = 3, 8, 3  # T-1 = 7, U = 4 -> one pad row
    init, pairs, mats, (jd, h), eps = _problem(jax.random.key(3), B, T, d)

    def run(unroll):
        return pallas_estep.lds_estep_stationary(
            init, mats, (jd, h), None, 2, block_b=8, interpret=True,
            eps=eps, unroll=unroll)

    s1, st1, kl1 = run(1)
    s4, st4, kl4 = run(4)
    np.testing.assert_allclose(float(kl4), float(kl1), rtol=1e-10)
    for a, b in zip(jax.tree.leaves(st1), jax.tree.leaves(st4)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(s4), np.asarray(s1),
                               rtol=1e-9, atol=1e-11)

    def loss(jd, h, unroll):
        s, (niw, mniw), kl = pallas_estep.lds_estep_stationary(
            init, mats, (jd, h), None, 2, block_b=8, interpret=True,
            eps=eps, unroll=unroll)
        return kl + jnp.sum(s) + jnp.sum(niw[0]) + jnp.sum(mniw[1])

    g1 = jax.grad(loss, argnums=(0, 1))(jd, h, 1)
    g4 = jax.grad(loss, argnums=(0, 1))(jd, h, 4)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g4)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-8, atol=1e-10)


def test_stationary_estep_valid_weights():
    """``valid`` reweights the MNIW statistics exactly like the generic
    batched path's formula (frames beyond a sequence's validity drop out
    of the transition stats and counts); all-ones matches valid=None."""
    B, T, d = 3, 6, 3
    init, pairs, mats, (jd, h), eps = _problem(jax.random.key(5), B, T, d)
    valid = jnp.asarray([[1, 1, 1, 1, 1, 1],
                         [1, 1, 1, 1, 0, 0],
                         [1, 1, 1, 0, 0, 0]], jnp.float64)

    base = pallas_estep.lds_estep_stationary(
        init, mats, (jd, h), None, 2, block_b=8, interpret=True, eps=eps)
    ones = pallas_estep.lds_estep_stationary(
        init, mats, (jd, h), None, 2, block_b=8, interpret=True, eps=eps,
        valid=jnp.ones((B, T), jnp.float64))
    for a, b in zip(jax.tree.leaves(base[1]), jax.tree.leaves(ones[1])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-12)

    got = pallas_estep.lds_estep_stationary(
        init, mats, (jd, h), None, 2, block_b=8, interpret=True, eps=eps,
        valid=valid)
    # reference formula from the unweighted full moments
    s_ref, (niw_ref, _), _ = base
    _, _, (E1, E2, E3, Pc) = (None, None, mats)
    from svae_tpu.ops import pallas_vjp
    N1 = -0.5 * jnp.vectorize(jnp.diag, signature="(d)->(d,d)")(jd)
    Tm = jnp.broadcast_to(E1, (T - 1,) + E1.shape)
    pairs_b = (Tm, jnp.broadcast_to(E2, Tm.shape),
               jnp.broadcast_to(E3, Tm.shape),
               jnp.broadcast_to(Pc, (T - 1,)))
    logZ, Jf, hf, Jb, hb = pallas_vjp.fb_pass(init, pairs_b, (N1, h),
                                              block_b=8, interpret=True)
    Ex, ExxT, Exnxt = pallas_vjp._smoother_assembly(pairs_b, (N1, h),
                                                    Jf, hf, Jb, hb)
    w = valid[:, 1:, None, None]
    ExnxtT = jnp.swapaxes(Exnxt, -1, -2)
    want = (jnp.sum(w * ExxT[:, 1:], axis=(0, 1)),
            jnp.sum(w * ExnxtT, axis=(0, 1)),
            jnp.sum(w * ExxT[:, :-1], axis=(0, 1)),
            jnp.sum(valid) - B)
    for a, b in zip(jax.tree.leaves(got[1][1]), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-11)


def test_posterior_moments_pallas_backend():
    """posterior_moments(backend='pallas') rides the packed pipeline and
    matches the vmapped XLA smoother, batched and unbatched, with and
    without an evidence mask."""
    B, T, d = 3, 7, 2
    ks = jax.random.split(jax.random.key(6), 3)
    glob = lds.init_pgm_param(ks[0], d, dtype=jnp.float64)
    jd = jax.nn.softplus(jax.random.normal(ks[1], (B, T, d),
                                           jnp.float64)) + 0.4
    h = jax.random.normal(ks[2], (B, T, d), jnp.float64)
    mask = jnp.ones((B, T)).at[:, 2].set(0)

    for kwargs in ({}, {"mask": mask}):
        ref = lds.posterior_moments(glob, (jd, h), backend="xla", **kwargs)
        got = lds.posterior_moments(glob, (jd, h), backend="pallas",
                                    interpret=True, **kwargs)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=1e-9, atol=1e-11)
    # single sequence
    ref = lds.posterior_moments(glob, (jd[0], h[0]), backend="xla")
    got = lds.posterior_moments(glob, (jd[0], h[0]), backend="pallas",
                                interpret=True)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-9, atol=1e-11)


def test_model_backend_routes_stationary():
    """run_inference(backend='pallas') with lengths=None goes through the
    packed path and matches the XLA backend end to end (incl. mask)."""
    B, T, d = 3, 6, 2
    key = jax.random.key(4)
    ks = jax.random.split(key, 4)
    glob = lds.init_pgm_param(ks[0], d, dtype=jnp.float64)
    jd = jax.nn.softplus(jax.random.normal(ks[1], (B, T, d),
                                           jnp.float64)) + 0.4
    h = jax.random.normal(ks[2], (B, T, d), jnp.float64)
    mask = jnp.asarray([[1, 1, 0, 1, 1, 1]] * B)

    out_x = lds.run_inference(glob, glob, (jd, h), ks[3], 2,
                              backend="xla", mask=mask)
    out_p = lds.run_inference(glob, glob, (jd, h), ks[3], 2,
                              backend="pallas", interpret=True, mask=mask)
    # stats + KLs agree exactly (samples use different noise layouts)
    for r, n in zip(jax.tree.leaves(out_x[1]), jax.tree.leaves(out_p[1])):
        np.testing.assert_allclose(np.asarray(n), np.asarray(r),
                                   rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(float(out_p[2]), float(out_x[2]), rtol=1e-9)
    np.testing.assert_allclose(float(out_p[3]), float(out_x[3]), rtol=1e-7)
