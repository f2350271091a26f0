"""Parity tests: parallel associative-scan Kalman kernels vs the float64
sequential oracles (the dual-implementation strategy, SURVEY.md section 4),
plus the gradient identity d logZ / d node-params = smoothed stats."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svae_tpu.ops import kalman, oracles
from tests.test_oracles import make_lds_potentials


def to_jnp(tree):
    return jax.tree.map(jnp.asarray, tree)


@pytest.fixture(params=[True, False, 4, 3],
                ids=["parallel", "sequential", "chunked4", "chunked3"])
def parallel(request):
    """Scan flavors: associative scan, sequential scan, and the blocked
    two-pass chunked scan (ints = chunk count; indivisible T-1 exercises
    the masked front-padding path)."""
    return request.param


@pytest.mark.parametrize("T1,C", [(13, 4), (13, 13), (5, 4), (7, 100),
                                  (12, 0), (1, 3)])
def test_chunked_scan_padding(T1, C):
    """The masked-pad chunked scan must match the plain sequential scan for
    ANY (length, chunk) combination, including all-pad leading chunks
    (T1=5, C=4 -> L=2, pad=3) and degenerate requests."""
    init, pairs, nodes = make_lds_potentials(T=T1 + 1, d=2, seed=3)
    leaves = kalman.build_leaves(*to_jnp((init, pairs, nodes)))

    e = jax.tree.map(lambda a: a[0], leaves)
    seq = [e]
    for t in range(1, T1):
        e = kalman.combine(e, jax.tree.map(lambda a: a[t], leaves))
        seq.append(e)
    total, pref = kalman._chunked_scan(leaves, C)
    for t in range(T1):
        for a, b in zip(jax.tree.leaves(seq[t]),
                        jax.tree.leaves(jax.tree.map(lambda x: x[t], pref))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-9, atol=1e-10)
    for a, b in zip(jax.tree.leaves(seq[-1]), jax.tree.leaves(total)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-10)


class TestLogZ:
    def test_matches_oracle(self, parallel):
        init, pairs, nodes = make_lds_potentials(T=14, d=3, seed=0)
        want = oracles.lds_logZ_dense(init, pairs, nodes)
        got = kalman.lds_logZ(*to_jnp((init, pairs, nodes)), parallel=parallel)
        np.testing.assert_allclose(got, want, rtol=1e-9)

    def test_time_varying(self, parallel):
        init, pairs, nodes = make_lds_potentials(T=9, d=2, seed=1, time_varying=True)
        want = oracles.lds_logZ_dense(init, pairs, nodes)
        got = kalman.lds_logZ(*to_jnp((init, pairs, nodes)), parallel=parallel)
        np.testing.assert_allclose(got, want, rtol=1e-9)

    def test_T2_edge(self, parallel):
        init, pairs, nodes = make_lds_potentials(T=2, d=3, seed=2)
        want = oracles.lds_logZ_dense(init, pairs, nodes)
        got = kalman.lds_logZ(*to_jnp((init, pairs, nodes)), parallel=parallel)
        np.testing.assert_allclose(got, want, rtol=1e-9)

    def test_jit_vmap_batch(self):
        # vmap over a batch of sequences (the minibatch axis)
        keys = [3, 4, 5]
        probs = [make_lds_potentials(T=7, d=2, seed=s) for s in keys]
        batch = jax.tree.map(lambda *xs: jnp.stack(xs), *to_jnp(probs))
        f = jax.jit(jax.vmap(kalman.lds_logZ))
        got = f(*batch)
        want = np.array([oracles.lds_logZ_dense(*p) for p in probs])
        np.testing.assert_allclose(got, want, rtol=1e-8)


class TestFilter:
    def test_filtered_potentials_match_oracle(self, parallel):
        init, pairs, nodes = make_lds_potentials(T=11, d=3, seed=3)
        logZ_o, Jf_o, hf_o = oracles.lds_filter_seq(init, pairs, nodes)
        logZ, Jf, hf = kalman.lds_filter(
            *to_jnp((init, pairs, nodes)), parallel=parallel
        )
        np.testing.assert_allclose(logZ, logZ_o, rtol=1e-9)
        np.testing.assert_allclose(Jf, Jf_o, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(hf, hf_o, rtol=1e-8, atol=1e-10)


class TestSmoother:
    def test_moments_match_dense(self, parallel):
        init, pairs, nodes = make_lds_potentials(T=10, d=3, seed=4)
        Ex_d, ExxT_d, Exnxt_d = oracles.lds_moments_dense(init, pairs, nodes)
        want_logZ = oracles.lds_logZ_dense(init, pairs, nodes)
        logZ, Ex, ExxT, Exnxt = kalman.lds_smoother(
            *to_jnp((init, pairs, nodes)), parallel=parallel
        )
        np.testing.assert_allclose(logZ, want_logZ, rtol=1e-9)
        np.testing.assert_allclose(Ex, Ex_d, rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(ExxT, ExxT_d, rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(Exnxt, Exnxt_d, rtol=1e-7, atol=1e-9)

    def test_grad_logZ_identity(self, parallel):
        """dlogZ/dN1 = E[xx^T], dlogZ/dN2 = E[x], dlogZ/dP2 = E[x' x^T]."""
        init, pairs, nodes = to_jnp(make_lds_potentials(T=8, d=2, seed=5))

        grads = jax.grad(
            lambda p, n: kalman.lds_logZ(init, p, n, parallel=parallel),
            argnums=(0, 1),
        )(pairs, nodes)
        (gP1, gP2, gP3, gPc), (gN1, gN2) = grads
        _, Ex, ExxT, Exnxt = kalman.lds_smoother(init, pairs, nodes, parallel=parallel)
        sym = lambda m: 0.5 * (m + jnp.swapaxes(m, -1, -2))
        # N1 pairs with x_t x_t^T (gradient may come back unsymmetrized)
        np.testing.assert_allclose(sym(gN1), ExxT, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(gN2, Ex, rtol=1e-6, atol=1e-8)
        # P2_t pairs with x_{t+1} x_t^T
        np.testing.assert_allclose(
            gP2, jnp.swapaxes(Exnxt, -1, -2), rtol=1e-6, atol=1e-8
        )
        # P1_t pairs with x_{t+1} x_{t+1}^T, P3_t with x_t x_t^T
        np.testing.assert_allclose(sym(gP1), ExxT[1:], rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(sym(gP3), ExxT[:-1], rtol=1e-6, atol=1e-8)
        # Pc_t pairs with the constant 1
        np.testing.assert_allclose(gPc, jnp.ones_like(gPc), rtol=1e-6)


class TestSampler:
    def test_sample_moments_match_dense(self, parallel):
        init, pairs, nodes = make_lds_potentials(T=6, d=2, seed=6)
        Ex_d, ExxT_d, Exnxt_d = oracles.lds_moments_dense(init, pairs, nodes)
        xs = kalman.lds_sample(
            *to_jnp((init, pairs, nodes)),
            key=jax.random.PRNGKey(0),
            num_samples=40_000,
            parallel=parallel,
        )
        assert xs.shape == (40_000, 6, 2)
        np.testing.assert_allclose(xs.mean(0), Ex_d, atol=2e-2)
        emp_ExxT = jnp.einsum("sti,stj->tij", xs, xs) / xs.shape[0]
        np.testing.assert_allclose(emp_ExxT, ExxT_d, atol=4e-2)
        emp_cross = jnp.einsum("sti,stj->tij", xs[:, :-1], xs[:, 1:]) / xs.shape[0]
        np.testing.assert_allclose(emp_cross, Exnxt_d, atol=4e-2)

    def test_parallel_equals_sequential_sampler(self):
        # identical keys must give bit-comparable samples across modes
        init, pairs, nodes = to_jnp(make_lds_potentials(T=9, d=3, seed=7))
        key = jax.random.PRNGKey(42)
        xs_p = kalman.lds_sample(init, pairs, nodes, key, 4, parallel=True)
        xs_s = kalman.lds_sample(init, pairs, nodes, key, 4, parallel=False)
        np.testing.assert_allclose(xs_p, xs_s, rtol=1e-8, atol=1e-10)

    def test_reparam_gradient_flows(self, parallel):
        init, pairs, nodes = to_jnp(make_lds_potentials(T=5, d=2, seed=8))

        def loss(nodes):
            xs = kalman.lds_sample(
                init, pairs, nodes, jax.random.PRNGKey(0), 3, parallel=parallel
            )
            return jnp.sum(xs**2)

        g = jax.grad(loss)(nodes)
        assert all(jnp.all(jnp.isfinite(x)) for x in jax.tree.leaves(g))
        assert any(jnp.any(x != 0) for x in jax.tree.leaves(g))


class TestInference:
    def test_fused_entry(self, parallel):
        init, pairs, nodes = to_jnp(make_lds_potentials(T=7, d=2, seed=9))
        samples, (Ex, ExxT, Exnxt), logZ = kalman.lds_inference(
            init, pairs, nodes, jax.random.PRNGKey(1), 5, parallel=parallel
        )
        assert samples.shape == (5, 7, 2)
        assert Ex.shape == (7, 2) and ExxT.shape == (7, 2, 2)
        assert Exnxt.shape == (6, 2, 2)
        assert jnp.isfinite(logZ)


def test_smoother_miscompile_barrier_present():
    """The XLA:TPU miscompile workaround in _smoother_core (jax 0.9.0 on
    v5e: reverse-scan-concat fusion into assemble_moments corrupts the
    t=T-2 suffix row under vmap) must stay in the lowered program until
    the pinned jax version is bumped AND benchmarks/onchip_parity.py's
    ragged section re-verifies on chip. This CPU-side guard catches an
    accidental removal without needing the chip."""
    init, pairs, nodes = to_jnp(make_lds_potentials(T=6, d=2, seed=11))
    for parallel in (False, True):
        jaxpr = jax.make_jaxpr(
            lambda p, n: kalman.lds_smoother(init, p, n, parallel=parallel)
        )(pairs, nodes)
        assert "optimization_barrier" in str(jaxpr), (
            "ops/kalman.py _smoother_core lost its miscompile barrier "
            f"(parallel={parallel})")
