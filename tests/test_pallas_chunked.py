"""Chunked (parallel-in-time) Pallas E-step vs the sequential XLA scans,
interpreter mode (ops/pallas_chunked.py). Mosaic-lowered on-chip parity is
covered by benchmarks/onchip_parity.py + bench.py (real TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svae_tpu.ops import kalman, pallas_chunked
from tests.test_oracles import make_lds_potentials


def batched_pots(B, T, d, seed=0):
    rng = np.random.RandomState(seed)
    init, pairs, nodes = make_lds_potentials(T=T, d=d, seed=seed,
                                             time_varying=True)
    N1 = np.tile(np.asarray(nodes[0])[None], (B, 1, 1, 1))
    N2 = rng.randn(B, T, d) * 0.5
    j = jax.tree.map(jnp.asarray, (init, pairs))
    return j[0], j[1], (jnp.asarray(N1), jnp.asarray(N2))


B, T, D = 3, 11, 3


@pytest.fixture(scope="module")
def pots():
    return batched_pots(B, T, D)


@pytest.fixture(scope="module")
def want(pots):
    init, pairs, nodes = pots
    return jax.vmap(lambda n1, n2: kalman.lds_smoother(
        init, pairs, (n1, n2), parallel=False))(nodes[0], nodes[1])


@pytest.mark.parametrize("C", [1, 2, 4, 10])
def test_smoother_matches_sequential(pots, want, C):
    """Covers divisible and PADDED (T1=10, C=4) chunkings; the pad leaves
    must contribute exactly zero (module docstring)."""
    init, pairs, nodes = pots
    got = pallas_chunked.lds_smoother(init, pairs, nodes, chunks=C,
                                      interpret=True)
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-10)


def test_grad_matches_sequential(pots):
    """Exercises the hand-derived adjoint kernel of the element scan
    (closed-form VJP of kalman.combine) through all three primitive
    invocations (prefix, suffix, chunk reduction)."""
    init, pairs, nodes = pots

    def loss(n2, fn):
        logZ, Ex, ExxT, Exnxt = fn(n2)
        return (jnp.sum(logZ) + jnp.sum(Ex * 0.3) + jnp.sum(ExxT * 0.1)
                + jnp.sum(Exnxt * 0.2))

    ref = lambda n2: jax.vmap(lambda a, b: kalman.lds_smoother(
        init, pairs, (a, b)))(nodes[0], n2)
    ch = lambda n2: pallas_chunked.lds_smoother(
        init, pairs, (nodes[0], n2), chunks=4, interpret=True)
    gw = jax.grad(lambda n2: loss(n2, ref))(nodes[1])
    gg = jax.grad(lambda n2: loss(n2, ch))(nodes[1])
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                               rtol=1e-9, atol=1e-10)


def test_estep_contract(pots):
    """Same return contract as pallas_vjp.lds_estep; samples match the
    XLA chunked sampler driven with the same key (the sampler IS that
    path, seeded by the Pallas-scanned filter messages)."""
    init, pairs, nodes = pots
    key = jax.random.PRNGKey(0)
    s, (Ex, ExxT, Exnxt), logZ = pallas_chunked.lds_estep(
        init, pairs, nodes, key, 2, chunks=4, interpret=True)
    assert s.shape == (2, B, T, D)
    assert logZ.shape == (B,)
    assert Exnxt.shape == (B, T - 1, D, D)
    assert np.isfinite(np.asarray(s)).all()
    # statistics must be consistent with the smoother
    want = pallas_chunked.lds_smoother(init, pairs, nodes, chunks=4,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(Ex), np.asarray(want[1]),
                               rtol=1e-9, atol=1e-10)


def test_combine_vjp_closed_form():
    """The kernel-side closed-form VJP formulas vs jax.vjp of the XLA
    combine, on random PD elements (the derivation's ground truth)."""
    def rand_elem(key, d):
        ks = jax.random.split(key, 6)
        A = jax.random.normal(ks[0], (d, d))
        Bm = jax.random.normal(ks[1], (d, d))
        return (A @ A.T + 2.0 * jnp.eye(d),
                0.3 * jax.random.normal(ks[2], (d, d)),
                Bm @ Bm.T + 2.0 * jnp.eye(d),
                jax.random.normal(ks[3], (d,)),
                jax.random.normal(ks[4], (d,)),
                jax.random.normal(ks[5], ()))

    d = 3
    ea = rand_elem(jax.random.PRNGKey(1), d)
    eb = rand_elem(jax.random.PRNGKey(2), d)
    out, vjp = jax.vjp(kalman.combine, ea, eb)
    g = jax.tree.map(jnp.ones_like, out)
    want = vjp(g)

    # run the row-packed formulas on a 1-lane layout
    def rows(e):
        return tuple([x.reshape(-1, 1)[i] for i in range(x.size)]
                     if x.ndim else x.reshape(1) for x in e)

    ra_ea = tuple(list(r) if isinstance(r, tuple) else r for r in rows(ea))
    ra_eb = tuple(list(r) if isinstance(r, tuple) else r for r in rows(eb))
    ra_g = tuple(list(r) if isinstance(r, tuple) else r for r in rows(g))
    dea, deb = pallas_chunked._combine_vjp_rows(ra_ea, ra_eb, ra_g, d)

    def unrows(r, like):
        if like.ndim == 0:
            return jnp.asarray(r).reshape(())
        return jnp.stack([jnp.asarray(x).reshape(()) for x in r]
                         ).reshape(like.shape)

    got = (tuple(unrows(r, l) for r, l in zip(dea, ea)),
           tuple(unrows(r, l) for r, l in zip(deb, eb)))
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-10)
