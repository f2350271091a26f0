"""Parity tests for the fused Pallas HMM forward-backward kernel
(svae_tpu/ops/pallas_hmm.py) against the XLA scan path (ops/hmm.py),
values AND gradients, under the CPU interpreter.

(reference: svae/hmm/cython_hmm_inference.pyx -- dual-implementation
parity, the reference's load-bearing test strategy per SURVEY.md
section 4.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svae_tpu.ops import hmm, pallas_hmm

BLOCK = 8  # small lane padding for interpreter speed


def _problem(key, B, T, K, dtype=jnp.float64):
    k1, k2, k3 = jax.random.split(key, 3)
    log_init = jax.nn.log_softmax(jax.random.normal(k1, (K,), dtype))
    log_trans = jax.nn.log_softmax(
        jax.random.normal(k2, (K, K), dtype), axis=-1)
    log_obs = jax.random.normal(k3, (B, T, K), dtype)
    return log_init, log_trans, log_obs


def _xla_posterior(log_init, log_trans, log_obs):
    return jax.vmap(lambda lo: hmm.hmm_posterior(log_init, log_trans, lo))(
        log_obs)


@pytest.mark.parametrize("kernel", ["streamed", "stationary"])
@pytest.mark.parametrize("T,unroll", [(8, 1), (9, 2), (50, 4)])
def test_posterior_parity(T, unroll, kernel):
    B, K = 3, 4
    li, lt, lo = _problem(jax.random.PRNGKey(0), B, T, K)
    ref = _xla_posterior(li, lt, lo)
    out = pallas_hmm.hmm_posterior(li, lt, lo, block_b=BLOCK,
                                   interpret=True, unroll=unroll,
                                   kernel=kernel)
    names = ["logZ", "node", "pair_sum", "init_marginal"]
    for n, a, b in zip(names, ref, out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-11, err_msg=n)


@pytest.mark.parametrize("kernel", ["streamed", "stationary"])
@pytest.mark.parametrize("T,unroll", [(7, 1), (10, 4)])
def test_grad_parity(T, unroll, kernel):
    """Gradient of a mixed loss over all four outputs, w.r.t. all three
    inputs -- exercises the fused adjoint kernel end to end."""
    B, K = 2, 3
    li, lt, lo = _problem(jax.random.PRNGKey(1), B, T, K)

    def loss(fn):
        def inner(li, lt, lo):
            logZ, node, pair, r1 = fn(li, lt, lo)
            return (jnp.sum(logZ) + jnp.sum(jnp.sin(node))
                    + jnp.sum(pair ** 2) + jnp.sum(jnp.cos(r1)))
        return inner

    g_ref = jax.grad(loss(_xla_posterior), argnums=(0, 1, 2))(li, lt, lo)
    g_pl = jax.grad(
        loss(lambda a, b, c: pallas_hmm.hmm_posterior(
            a, b, c, block_b=BLOCK, interpret=True, unroll=unroll,
            kernel=kernel)),
        argnums=(0, 1, 2))(li, lt, lo)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pl)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-8, atol=1e-10)


def test_sharp_messages_stable():
    """Near-deterministic transitions (the regime where naive
    log-of-exp-matmul backward NaNs): values and grads stay finite and
    match the XLA path, f32."""
    B, T, K = 2, 12, 3
    li, lt, lo = _problem(jax.random.PRNGKey(2), B, T, K, jnp.float32)
    lt = jnp.log(0.999 * jnp.eye(K) + 1e-3).astype(jnp.float32)  # sticky
    lo = 40.0 * lo  # sharp evidence

    def f(lo_):
        logZ, node, pair, r1 = pallas_hmm.hmm_posterior(
            li, lt, lo_, block_b=BLOCK, interpret=True, unroll=1)
        return jnp.sum(logZ) + jnp.sum(node ** 2)

    val, g = jax.value_and_grad(f)(lo)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(g)))
    ref = _xla_posterior(li, lt, lo)
    out = pallas_hmm.hmm_posterior(li, lt, lo, block_b=BLOCK,
                                   interpret=True, unroll=1)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]),
                               rtol=2e-5, atol=2e-6)


def test_sparse_transition_forced_switch_pair_sum_finite():
    """Round-5 review regression: a strongly-disfavored transition
    (log_trans entry ~ -100, e.g. digamma expected-stats of a sparse
    Dirichlet) FORCED by the observations must produce a finite, correct
    pair count. A factorized matmul pair assembly overflowed here
    (0 * inf = NaN) and was reverted to the exponent-bounded
    materialized form."""
    K = 2
    li = jnp.log(jnp.asarray([0.999, 0.001]))
    lt = jnp.log(jnp.asarray([[0.999, 0.001], [0.001, 0.999]]))
    lt = lt.at[0, 1].set(-100.0)  # near-forbidden switch
    # observations force state 0 early, state 1 late -> the chain MUST
    # take the forbidden 0->1 transition exactly once
    lo = jnp.stack([jnp.asarray([50.0, -50.0])] * 3
                   + [jnp.asarray([-50.0, 50.0])] * 3)[None]  # (1, 6, 2)
    ref = _xla_posterior(li, lt, lo)
    out = pallas_hmm.hmm_posterior(li, lt, lo, block_b=BLOCK,
                                   interpret=True, unroll=1)
    for n, a, b in zip(("logZ", "node", "pair_sum", "r1"), ref, out):
        assert np.all(np.isfinite(np.asarray(b))), n
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-9, err_msg=n)
    # the forced switch shows up as ~1 expected 0->1 transition
    assert 0.9 < float(out[2][0, 0, 1]) < 1.1


def test_explicit_stationary_kernel_with_time_varying_raises():
    """An EXPLICIT kernel='stationary' request with 4-D transitions must
    raise, not silently run the streamed kernel (mirrors the
    posterior_moments ragged guard convention)."""
    B, T, K = 2, 5, 3
    li, lt, lo = _problem(jax.random.PRNGKey(3), B, T, K)
    ltv = jnp.broadcast_to(lt[None, None], (B, T - 1, K, K))
    with pytest.raises(ValueError, match="stationary"):
        pallas_hmm.hmm_posterior(li, ltv, lo, block_b=BLOCK,
                                 interpret=True, kernel="stationary")
    with pytest.raises(ValueError, match="kernel"):
        pallas_hmm.hmm_posterior(li, lt, lo, block_b=BLOCK,
                                 interpret=True, kernel="bogus")


def test_pair_weights_with_stationary_transitions():
    """pair_weights with a STATIONARY (2-D) log_trans on the batched
    kernel path (the SLDS ragged path passes time-varying transitions, so
    this combination is only reachable by direct users): weighted pair
    counts match the per-sequence XLA path, values and grads."""
    B, T, K = 3, 9, 4
    li, lt, lo = _problem(jax.random.PRNGKey(6), B, T, K)
    w = jnp.asarray(np.random.RandomState(0).rand(B, T - 1))

    ref = jax.vmap(lambda l, ww: hmm.hmm_posterior(li, lt, l,
                                                   pair_weights=ww))(lo, w)
    out = pallas_hmm.hmm_posterior(li, lt, lo, block_b=BLOCK,
                                   interpret=True, unroll=2,
                                   pair_weights=w)
    for n, a, b in zip(("logZ", "node", "pair_sum", "r1"), ref, out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-9, atol=1e-11, err_msg=n)

    def loss(fn):
        return lambda l: jnp.sum(fn(l)[2] ** 2)

    g_ref = jax.grad(loss(lambda l: jax.tree.map(
        jnp.stack, jax.vmap(lambda x, ww: hmm.hmm_posterior(
            li, lt, x, pair_weights=ww))(l, w))))(lo)
    g_pl = jax.grad(loss(lambda l: pallas_hmm.hmm_posterior(
        li, lt, l, block_b=BLOCK, interpret=True, unroll=2,
        pair_weights=w)))(lo)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               rtol=1e-8, atol=1e-10)
