"""Parity tests for the bidirectional lane-packed kernels
(ops/pallas_bidir.py): values AND gradients against the interleaved
fused-kernel path (ops/pallas_vjp.py, itself oracle-verified), in the
Pallas interpreter (CPU CI). Covers shared and per-sequence pair layouts,
lane padding (odd B), unroll with tail-pad masking, and the automatic
routing rule in ``pallas_vjp.fb_pass``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svae_tpu.ops import pallas_vjp
from svae_tpu.ops import pallas_bidir

BLOCK = 8  # small lane block: exercises padding on the CPU interpreter


def _rand_psd(key, d, dtype):
    G = jax.random.normal(key, (d, d), dtype)
    return G @ G.T / d


def _chain(key, B, T, d, dtype=jnp.float64, bpairs=False):
    ks = jax.random.split(key, 8)
    I1 = -0.5 * (jnp.eye(d, dtype=dtype)
                 + 0.1 * _rand_psd(ks[0], d, dtype))
    I2 = 0.3 * jax.random.normal(ks[1], (d,), dtype)
    Ic = jnp.asarray(0.7, dtype)

    def pair_shape(shape):
        return ((B,) + shape) if bpairs else shape

    A = 0.8 * jax.random.orthogonal(ks[2], d).astype(dtype)
    Qi = jnp.linalg.inv(0.4 * jnp.eye(d, dtype=dtype)
                        + 0.1 * _rand_psd(ks[3], d, dtype))
    P1 = jnp.broadcast_to(-0.5 * Qi, pair_shape((T - 1, d, d)))
    P2 = jnp.broadcast_to(Qi @ A, pair_shape((T - 1, d, d)))
    P3 = jnp.broadcast_to(-0.5 * A.T @ Qi @ A, pair_shape((T - 1, d, d)))
    Pc = jnp.broadcast_to(jnp.asarray(0.1, dtype), pair_shape((T - 1,)))
    if bpairs:
        w = 1.0 + 0.2 * jax.random.uniform(ks[4], (B, 1, 1, 1), dtype)
        P1 = P1 * w
        P3 = P3 * w
        Pc = Pc * (1.0 + 0.1 * jax.random.uniform(ks[4], (B, 1), dtype))

    Jd = jax.nn.softplus(jax.random.normal(ks[5], (B, T, d), dtype)) + 0.4
    N1 = -0.5 * jax.vmap(jax.vmap(jnp.diag))(Jd)
    N2 = jax.random.normal(ks[6], (B, T, d), dtype)
    return (I1, I2, Ic), (P1, P2, P3, Pc), (N1, N2)


def _fb(init, pairs, nodes, bidir, unroll=1):
    return pallas_vjp.fb_pass(init, pairs, nodes, block_b=BLOCK,
                              interpret=True, unroll=unroll, bidir=bidir)


@pytest.mark.parametrize("bpairs", [False, True])
@pytest.mark.parametrize("B", [3, 4])  # 2B=6: lane pad; 2B=8: exact
def test_bidir_forward_matches_fb(bpairs, B):
    T, d = 7, 3
    init, pairs, nodes = _chain(jax.random.key(0), B, T, d, bpairs=bpairs)
    ref = _fb(init, pairs, nodes, bidir=False)
    got = _fb(init, pairs, nodes, bidir=True)
    for r, g, name in zip(ref, got, ("logZ", "Jf", "hf", "Jb", "hb")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-12, atol=1e-12, err_msg=name)


@pytest.mark.parametrize("unroll,T", [(1, 6), (4, 7), (4, 9)])
def test_bidir_unroll_tail_masking(unroll, T):
    """T-1 not a multiple of U exercises the tail-pad masking on both
    halves of the lane layout."""
    B, d = 3, 3
    init, pairs, nodes = _chain(jax.random.key(1), B, T, d)
    ref = _fb(init, pairs, nodes, bidir=False, unroll=1)
    got = _fb(init, pairs, nodes, bidir=True, unroll=unroll)
    for r, g, name in zip(ref, got, ("logZ", "Jf", "hf", "Jb", "hb")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-10, atol=1e-10, err_msg=name)


@pytest.mark.parametrize("bpairs", [False, True])
def test_bidir_grads_match_fb(bpairs):
    """Gradients through every output channel and every input (init,
    pairs -- incl. the shared-pair broadcast reduction -- and nodes)
    against the interleaved path's hand-derived adjoints."""
    B, T, d = 3, 6, 3
    init, pairs, nodes = _chain(jax.random.key(2), B, T, d, bpairs=bpairs)
    k = jax.random.split(jax.random.key(3), 5)

    def loss(init, pairs, nodes, bidir):
        logZ, Jf, hf, Jb, hb = _fb(init, pairs, nodes, bidir=bidir)
        ws = [jax.random.normal(kk, x.shape, x.dtype)
              for kk, x in zip(k, (logZ, Jf, hf, Jb, hb))]
        return sum(jnp.sum(w * x)
                   for w, x in zip(ws, (logZ, Jf, hf, Jb, hb)))

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(init, pairs, nodes, False)
    g_new = jax.grad(loss, argnums=(0, 1, 2))(init, pairs, nodes, True)
    flat_r, _ = jax.tree.flatten(g_ref)
    flat_n, _ = jax.tree.flatten(g_new)
    for r, n in zip(flat_r, flat_n):
        np.testing.assert_allclose(np.asarray(n), np.asarray(r),
                                   rtol=1e-8, atol=1e-10)


def test_auto_routing_rule():
    """bidir=None picks the packed layout exactly when it needs strictly
    fewer lane blocks."""
    cases = {64: True, 16: True, 100: False, 128: False, 192: True,
             256: False, 65: False}
    for B, want in cases.items():
        got = -(-2 * B // 128) < 2 * (-(-B // 128))
        assert got == want, (B, got, want)


def test_estep_uses_bidir_consistently():
    """lds_estep output is invariant to the routing (same math either
    way); run at a B where auto-routing flips bidir on."""
    B, T, d, S = 3, 6, 3, 2
    init, pairs, nodes = _chain(jax.random.key(4), B, T, d)
    key = jax.random.key(5)
    s_ref, st_ref, lz_ref = pallas_vjp.lds_estep(
        init, pairs, nodes, key, S, block_b=BLOCK, interpret=True)
    # force the interleaved path via a direct smoother+sampler compose
    logZ, Jf, hf, Jb, hb = _fb(init, pairs, nodes, bidir=False)
    Ex, ExxT, Exnxt = pallas_vjp._smoother_assembly(
        pairs, nodes, Jf, hf, Jb, hb)
    samples = pallas_vjp.lds_sample(init, pairs, nodes, key, S,
                                    block_b=BLOCK, interpret=True,
                                    filtered=(Jf, hf))
    np.testing.assert_allclose(np.asarray(lz_ref), np.asarray(logZ),
                               rtol=1e-11)
    for r, g in zip((Ex, ExxT, Exnxt), (st_ref[0], st_ref[1], st_ref[2])):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(s_ref), np.asarray(samples),
                               rtol=1e-9, atol=1e-11)
