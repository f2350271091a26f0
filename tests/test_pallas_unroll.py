"""U-step time-unroll parity for the fused Pallas kernels
(ops/pallas_vjp.py ``unroll=``): the unrolled kernels must reproduce the
step-at-a-time (U=1) path exactly -- values AND hand-derived adjoint
gradients -- for both divisible and non-divisible (masked zero-pad) T.

The U=1 path is itself XLA-parity-tested in tests/test_pallas_vjp.py, so
agreement here certifies the unrolled production configuration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svae_tpu.ops import pallas_vjp
from tests.test_pallas_vjp import BLOCK, _chain


# T=7 -> T1=6: U=3 divides (unmasked fast path), U=4 pads 6->8 (masked)
@pytest.mark.parametrize("U", [3, 4])
def test_smoother_unroll_matches_u1(U):
    init, pairs, nodes = _chain(jax.random.PRNGKey(7), B=3, T=7, d=3)

    def run(unroll):
        return pallas_vjp.lds_smoother(init, pairs, nodes, block_b=BLOCK,
                                       interpret=True, unroll=unroll)

    want = run(1)
    got = run(U)
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-11)

    def loss(unroll):
        def f(init, pairs, nodes):
            logZ, Ex, ExxT, Exnxt = pallas_vjp.lds_smoother(
                init, pairs, nodes, block_b=BLOCK, interpret=True,
                unroll=unroll)
            return (jnp.sum(logZ) + jnp.sum(Ex ** 2) + jnp.sum(ExxT)
                    + jnp.sum(jnp.cos(Exnxt)))
        return f

    g1 = jax.grad(loss(1), argnums=(0, 1, 2))(init, pairs, nodes)
    gU = jax.grad(loss(U), argnums=(0, 1, 2))(init, pairs, nodes)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(gU)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("U", [4])
def test_sampler_unroll_matches_u1(U):
    B, T, d, S = 2, 6, 3, 2  # T1=5: masked (pads precede the reverse sweep)
    init, pairs, nodes = _chain(jax.random.PRNGKey(8), B=B, T=T, d=d)
    eps = jax.random.normal(jax.random.PRNGKey(9), (S, B, T, d),
                            jnp.float64)

    def sample(unroll):
        return pallas_vjp.lds_sample(init, pairs, nodes, None, S,
                                     block_b=BLOCK, interpret=True,
                                     eps=eps, unroll=unroll)

    np.testing.assert_allclose(np.asarray(sample(U)),
                               np.asarray(sample(1)),
                               rtol=1e-9, atol=1e-11)

    def loss(unroll):
        def f(init, pairs, nodes):
            xs = pallas_vjp.lds_sample(init, pairs, nodes, None, S,
                                       block_b=BLOCK, interpret=True,
                                       eps=eps, unroll=unroll)
            return jnp.sum(xs ** 2) + jnp.sum(jnp.sin(xs))
        return f

    g1 = jax.grad(loss(1), argnums=(0, 1, 2))(init, pairs, nodes)
    gU = jax.grad(loss(U), argnums=(0, 1, 2))(init, pairs, nodes)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(gU)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-8, atol=1e-10)


def test_estep_unroll_bigger_than_T():
    """U > T1 degenerates to a single all-masked block."""
    B, T, d = 2, 4, 2
    init, pairs, nodes = _chain(jax.random.PRNGKey(10), B=B, T=T, d=d)
    key = jax.random.PRNGKey(0)

    def estep(unroll):
        return pallas_vjp.lds_estep(init, pairs, nodes, key, 2,
                                    block_b=BLOCK, interpret=True,
                                    unroll=unroll)

    want = estep(1)
    got = estep(8)
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("fused_adj", [False, True])
def test_fb_pass_matches_separate(fused_adj):
    """The fused forward+backward pass (pallas_vjp.fb_pass) vs the two
    standalone primitives: values and gradients, both adjoint variants
    (the fused mixed-direction adjoint kernel stays parity-tested even
    though the separate adjoints are the production default)."""
    init, pairs, nodes = _chain(jax.random.PRNGKey(11), B=2, T=7, d=3)

    logZ, Jf, hf, Jb, hb = pallas_vjp.fb_pass(
        init, pairs, nodes, block_b=BLOCK, interpret=True,
        fused_adj=fused_adj)
    logZ_w, Jf_w, hf_w = pallas_vjp.lds_filter(
        init, pairs, nodes, block_b=BLOCK, interpret=True)
    Jb_w, hb_w = pallas_vjp.lds_backward(
        pairs, nodes, block_b=BLOCK, interpret=True)
    for a, b in zip((logZ_w, Jf_w, hf_w, Jb_w, hb_w),
                    (logZ, Jf, hf, Jb, hb)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-11)

    def loss_fb(init, pairs, nodes):
        logZ, Jf, hf, Jb, hb = pallas_vjp.fb_pass(
            init, pairs, nodes, block_b=BLOCK, interpret=True,
            fused_adj=fused_adj, unroll=2)  # T1=6, U=2: divisible path
        return (jnp.sum(logZ) + jnp.sum(jnp.sin(Jf)) + jnp.sum(hf ** 2)
                + jnp.sum(Jb * 0.3) + jnp.sum(jnp.cos(hb)))

    def loss_sep(init, pairs, nodes):
        logZ, Jf, hf = pallas_vjp.lds_filter(
            init, pairs, nodes, block_b=BLOCK, interpret=True)
        Jb, hb = pallas_vjp.lds_backward(
            pairs, nodes, block_b=BLOCK, interpret=True)
        return (jnp.sum(logZ) + jnp.sum(jnp.sin(Jf)) + jnp.sum(hf ** 2)
                + jnp.sum(Jb * 0.3) + jnp.sum(jnp.cos(hb)))

    gf = jax.grad(loss_fb, argnums=(0, 1, 2))(init, pairs, nodes)
    gs = jax.grad(loss_sep, argnums=(0, 1, 2))(init, pairs, nodes)
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-7, atol=1e-9)
