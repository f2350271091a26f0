"""Parity tests for the differentiable Pallas kernels (ops/pallas_vjp.py):
forward values AND hand-derived adjoint gradients against the XLA scan
implementation (ops/kalman.py), in the Pallas interpreter (CPU CI).

The XLA path is itself oracle-verified (tests/test_kalman.py), so value +
gradient agreement here certifies the custom-VJP adjoint recursions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svae_tpu.ops import kalman, pallas_vjp

BLOCK = 8  # small lane block: exercises padding on CPU interpreter


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
    if bpairs:  # perturb per-sequence so the layout is actually exercised
        w = 1.0 + 0.2 * jax.random.uniform(ks[4], (B, 1, 1, 1), dtype)
        P1 = P1 * w
        P3 = P3 * w
        Pc = Pc * (1.0 + 0.1 * jax.random.uniform(ks[4], (B, 1), dtype))

    Jd = jax.nn.softplus(jax.random.normal(ks[5], (B, T, d), dtype)) + 0.4
    N1 = -0.5 * jax.vmap(jax.vmap(jnp.diag))(Jd)
    N2 = jax.random.normal(ks[6], (B, T, d), dtype)
    return (I1, I2, Ic), (P1, P2, P3, Pc), (N1, N2)


def _rand_psd(key, d, dtype):
    G = jax.random.normal(key, (d, d), dtype)
    return G @ G.T / d


def _vmap_xla(fn, init, pairs, nodes, bpairs):
    """Batched XLA reference: vmap over the batch, pairs mapped only in
    the bpairs layout."""
    pair_ax = 0 if bpairs else None
    return jax.vmap(lambda p, n: fn(init, p, n),
                    in_axes=(pair_ax, 0))(pairs, nodes)


@pytest.mark.parametrize("bpairs", [False, True])
def test_filter_forward_and_grad_parity(bpairs):
    init, pairs, nodes = _chain(jax.random.PRNGKey(0), B=3, T=7, d=3,
                                bpairs=bpairs)

    logZ, Jf, hf = pallas_vjp.lds_filter(init, pairs, nodes, block_b=BLOCK,
                                         interpret=True)
    logZ_x, Jf_x, hf_x = _vmap_xla(kalman.lds_filter, init, pairs, nodes,
                                   bpairs)
    np.testing.assert_allclose(logZ, logZ_x, rtol=1e-9)
    np.testing.assert_allclose(Jf, Jf_x, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(hf, hf_x, rtol=1e-8, atol=1e-10)

    # gradient parity on a scalar functional touching logZ + messages
    def loss_p(init, pairs, nodes):
        logZ, Jf, hf = pallas_vjp.lds_filter(init, pairs, nodes,
                                             block_b=BLOCK, interpret=True)
        return (jnp.sum(logZ) + jnp.sum(jnp.sin(Jf)) +
                jnp.sum(hf ** 2))

    def loss_x(init, pairs, nodes):
        logZ, Jf, hf = _vmap_xla(kalman.lds_filter, init, pairs, nodes,
                                 bpairs)
        return (jnp.sum(logZ) + jnp.sum(jnp.sin(Jf)) +
                jnp.sum(hf ** 2))

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(init, pairs, nodes)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(init, pairs, nodes)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gx)):
        np.testing.assert_allclose(a, b, rtol=1e-7, atol=1e-9)


@pytest.mark.parametrize("bpairs", [False, True])
def test_smoother_forward_and_grad_parity(bpairs):
    init, pairs, nodes = _chain(jax.random.PRNGKey(1), B=2, T=6, d=3,
                                bpairs=bpairs)

    out_p = pallas_vjp.lds_smoother(init, pairs, nodes, block_b=BLOCK,
                                    interpret=True)
    out_x = _vmap_xla(kalman.lds_smoother, init, pairs, nodes, bpairs)
    for a, b in zip(out_p, out_x):
        np.testing.assert_allclose(a, b, rtol=1e-7, atol=1e-9)

    def loss(fn):
        def f(init, pairs, nodes):
            logZ, Ex, ExxT, Exnxt = fn(init, pairs, nodes)
            return (jnp.sum(logZ) + jnp.sum(Ex ** 2) + jnp.sum(ExxT)
                    + jnp.sum(jnp.cos(Exnxt)))
        return f

    gp = jax.grad(
        loss(lambda i, p, n: pallas_vjp.lds_smoother(
            i, p, n, block_b=BLOCK, interpret=True)),
        argnums=(0, 1, 2))(init, pairs, nodes)
    gx = jax.grad(
        loss(lambda i, p, n: _vmap_xla(kalman.lds_smoother, i, p, n,
                                       bpairs)),
        argnums=(0, 1, 2))(init, pairs, nodes)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gx)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("bpairs", [False, True])
def test_sampler_forward_and_grad_parity(bpairs):
    B, T, d, S = 2, 6, 3, 2
    init, pairs, nodes = _chain(jax.random.PRNGKey(2), B=B, T=T, d=d,
                                bpairs=bpairs)
    eps = jax.random.normal(jax.random.PRNGKey(3), (S, B, T, d),
                            jnp.float64)

    def xla_sample(init, pairs, nodes, eps):
        # kalman.lds_sample consumes a key; replicate its noise path by
        # solving with the same eps through the conditional construction
        pair_ax = 0 if bpairs else None

        def one(p, n, e):
            logZ, Jf, hf = kalman.lds_filter(init, p, n)
            from svae_tpu.utils import smallchol
            from svae_tpu.utils.psd import symmetrize
            P1, P2, P3, Pc = p
            Jc = Jf[:-1] - 2.0 * P3
            Lc = smallchol.chol(symmetrize(Jc))
            F = smallchol.cho_solve_mat(Lc, jnp.swapaxes(P2, -1, -2))
            f = smallchol.cho_solve(Lc, hf[:-1])
            LT = smallchol.chol(symmetrize(Jf[-1]))
            muT = smallchol.cho_solve(LT, hf[-1])
            xT = muT + smallchol.solve_upper_from_lower(LT, e[:, T - 1])
            g = f + smallchol.solve_upper_from_lower(Lc, e[:, : T - 1])

            def step(carry, Fg):
                Ft, gt = Fg
                x = (Ft @ carry[..., None])[..., 0] + gt
                return x, x

            Fb = jnp.broadcast_to(F[:, None], (T - 1, S, d, d))
            _, xs = jax.lax.scan(step, xT, (Fb, jnp.moveaxis(g, 1, 0)),
                                 reverse=True)
            return jnp.concatenate([jnp.moveaxis(xs, 0, 1),
                                    xT[:, None]], axis=1)

        return jax.vmap(one, in_axes=(pair_ax, 0, 1),
                        out_axes=1)(pairs, nodes, eps)

    xs_p = pallas_vjp.lds_sample(init, pairs, nodes, None, S,
                                 block_b=BLOCK, interpret=True, eps=eps)
    xs_x = xla_sample(init, pairs, nodes, eps)
    np.testing.assert_allclose(xs_p, xs_x, rtol=1e-7, atol=1e-9)

    def loss(sample_fn):
        def f(init, pairs, nodes):
            xs = sample_fn(init, pairs, nodes)
            return jnp.sum(xs ** 2) + jnp.sum(jnp.sin(xs))
        return f

    gp = jax.grad(
        loss(lambda i, p, n: pallas_vjp.lds_sample(
            i, p, n, None, S, block_b=BLOCK, interpret=True, eps=eps)),
        argnums=(0, 1, 2))(init, pairs, nodes)
    gx = jax.grad(loss(lambda i, p, n: xla_sample(i, p, n, eps)),
                  argnums=(0, 1, 2))(init, pairs, nodes)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gx)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-8)


def test_estep_matches_xla_inference_with_shared_noise():
    """Full fused E-step vs kalman.lds_inference: moments + logZ match; the
    samplers consume key-derived noise differently, so samples are checked
    through the zero-noise hook (mean trajectory)."""
    B, T, d = 2, 5, 2
    init, pairs, nodes = _chain(jax.random.PRNGKey(4), B=B, T=T, d=d)

    samples, (Ex, ExxT, Exnxt), logZ = pallas_vjp.lds_estep(
        init, pairs, nodes, jax.random.PRNGKey(0), 3, block_b=BLOCK,
        interpret=True)
    assert samples.shape == (3, B, T, d)

    out_x = _vmap_xla(kalman.lds_smoother, init, pairs, nodes, False)
    np.testing.assert_allclose(logZ, out_x[0], rtol=1e-9)
    np.testing.assert_allclose(Ex, out_x[1], rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(ExxT, out_x[2], rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(Exnxt, out_x[3], rtol=1e-7, atol=1e-9)

    # zero noise -> exactly the smoothed means
    xs0 = pallas_vjp.lds_sample(init, pairs, nodes, None, 1, block_b=BLOCK,
                                interpret=True,
                                eps=jnp.zeros((1, B, T, d)))
    np.testing.assert_allclose(xs0[0], out_x[1], rtol=1e-6, atol=1e-8)


def test_estep_grad_vs_finite_differences():
    """End-to-end gradient of an ELBO-shaped functional through the fused
    E-step vs central finite differences (the reference's hand-VJP test
    strategy, SURVEY.md section 4)."""
    B, T, d, S = 2, 5, 2, 2
    init, pairs, nodes = _chain(jax.random.PRNGKey(5), B=B, T=T, d=d)
    eps = jax.random.normal(jax.random.PRNGKey(6), (S, B, T, d),
                            jnp.float64)

    def objective(nodes_flat):
        N1, N2 = nodes_flat
        filt = pallas_vjp.lds_filter(init, pairs, (N1, N2), block_b=BLOCK,
                                     interpret=True)
        logZ, Jf, hf = filt
        _, Ex, ExxT, _ = pallas_vjp.lds_smoother(
            init, pairs, (N1, N2), block_b=BLOCK, interpret=True,
            filtered=filt)
        xs = pallas_vjp.lds_sample(init, pairs, (N1, N2), None, S,
                                   block_b=BLOCK, interpret=True,
                                   filtered=(Jf, hf), eps=eps)
        local_kl = (jnp.sum(N1 * ExxT) + jnp.sum(N2 * Ex) - jnp.sum(logZ))
        return jnp.sum(jnp.tanh(xs)) - local_kl

    # Matrix potentials (N1, like P1/P3) live on the SYMMETRIC subspace --
    # the kernels read the lower triangle of the conditioned precision and
    # the custom VJP returns symmetrized cotangents (matching the XLA
    # path's symmetrize calls), so perturb symmetrically and compare the
    # directional derivative <g, e>.
    g = jax.grad(objective)(nodes)
    rng = np.random.RandomState(0)
    for li, (leaf, gleaf) in enumerate(zip(nodes, g)):
        leaf = np.asarray(leaf)
        for _ in range(4):
            idx = tuple(rng.randint(s) for s in leaf.shape)
            e = np.zeros_like(leaf)
            e[idx] = 1e-5
            if leaf.ndim == 4:  # symmetric matrix leaf: mirror (i, j)
                b, t, i, j = idx
                e[b, t, j, i] = 1e-5
            pert = lambda x: ((jnp.asarray(x), nodes[1]) if li == 0
                              else (nodes[0], jnp.asarray(x)))
            fd = (float(objective(pert(leaf + e)))
                  - float(objective(pert(leaf - e)))) / 2e-5
            want = float(np.sum(np.asarray(gleaf) * (e / 1e-5)))
            np.testing.assert_allclose(want, fd, rtol=2e-5, atol=1e-7)
