"""LDS-SVAE model tests: plumbing of expected potentials into the Kalman
kernels, stats congruence, the grad(logZ) stats identity at the model level,
and KL sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svae_tpu.expfam import niw, mniw
from svae_tpu.models import lds
from svae_tpu.ops import kalman, oracles

KEY = jax.random.PRNGKey(0)


def _setup(d=2, T=7, B=3, seed=0):
    glob = lds.init_pgm_param(jax.random.PRNGKey(seed), d, dtype=jnp.float64)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed + 1))
    J = jax.nn.softplus(jax.random.normal(k1, (B, T, d), jnp.float64)) + 0.5
    h = jax.random.normal(k2, (B, T, d), jnp.float64)
    return glob, (J, h)


def test_potentials_match_oracle_smoother():
    glob, (J, h) = _setup()
    T = J.shape[1]
    init, pairs = lds.expected_chain_potentials(glob, T)
    nodes = lds._node_potentials((J[0], h[0]))
    logZ, Ex, ExxT, Exnxt = kalman.lds_smoother(init, pairs, nodes)
    o_logZ, o_Ex, o_ExxT, o_Exnxt = oracles.lds_smoother_seq(
        *jax.tree.map(np.asarray, (init, pairs, nodes))
    )
    np.testing.assert_allclose(float(logZ), o_logZ, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(Ex), o_Ex, atol=1e-8)
    np.testing.assert_allclose(np.asarray(ExxT), o_ExxT, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Exnxt), o_Exnxt, atol=1e-8)


def test_stats_congruent_with_globals():
    glob, pots = _setup()
    samples, stats, gkl, lkl = lds.run_inference(glob, glob, pots, KEY,
                                                 num_samples=2)
    assert jax.tree.structure(stats) == jax.tree.structure(glob)
    B, T, d = pots[0].shape
    assert samples.shape == (2, B, T, d)
    niw_stats, mniw_stats = stats
    np.testing.assert_allclose(float(niw_stats[2]), B, rtol=1e-12)
    np.testing.assert_allclose(float(mniw_stats[3]), B * (T - 1), rtol=1e-12)


def test_stats_equal_grad_of_local_elbo_terms():
    """The MNIW/NIW stats collected from the smoother must equal the
    gradient of the chain logZ w.r.t. the expected potentials -- the
    conjugacy identity the natural gradient relies on."""
    glob, (J, h) = _setup(B=1)
    T, d = J.shape[1], J.shape[2]
    nodes = lds._node_potentials((J[0], h[0]))

    init, pairs = lds.expected_chain_potentials(glob, T)

    def logZ_of(init, pairs):
        return kalman.lds_logZ(init, pairs, nodes)

    gi, gp = jax.grad(logZ_of, argnums=(0, 1))(init, pairs)
    _, Ex, ExxT, Exnxt = kalman.lds_smoother(init, pairs, nodes)
    # init potential I1 pairs with x_1 x_1^T, I2 with x_1
    np.testing.assert_allclose(np.asarray(gi[0]), np.asarray(ExxT[0]),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(gi[1]), np.asarray(Ex[0]),
                               atol=1e-7)
    # pair potentials P1/P2/P3 pair with x'x'^T, x'x^T, xx^T per step
    np.testing.assert_allclose(np.asarray(jnp.sum(gp[0], 0)),
                               np.asarray(jnp.sum(ExxT[1:], 0)), atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(jnp.sum(gp[1], 0)),
        np.asarray(jnp.sum(jnp.swapaxes(Exnxt, -1, -2), 0)), atol=1e-7)
    np.testing.assert_allclose(np.asarray(jnp.sum(gp[2], 0)),
                               np.asarray(jnp.sum(ExxT[:-1], 0)), atol=1e-7)


def test_local_kl_nonnegative():
    glob, pots = _setup(B=4, seed=5)
    _, _, _, lkl = lds.run_inference(glob, glob, pots, KEY, num_samples=1)
    assert float(lkl) >= -1e-6


def test_prior_kl_zero_at_prior():
    glob, _ = _setup()
    assert abs(float(lds.prior_kl(glob, glob))) < 1e-8
    other = jax.tree.map(lambda a: a * 1.05 + 0.01, glob)
    assert float(lds.prior_kl(other, glob)) > 0


def test_sequential_and_parallel_paths_agree():
    glob, pots = _setup(B=2, T=9)
    s1, st1, g1, l1 = lds.run_inference(glob, glob, pots, KEY, 2,
                                        parallel=True)
    s2, st2, g2, l2 = lds.run_inference(glob, glob, pots, KEY, 2,
                                        parallel=False)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-7)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=1e-7),
        st1, st2)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-8)


def test_posterior_moments_and_predict():
    glob, (J, h) = _setup(d=2, T=8, B=2)
    Ex, ExxT, Exnxt, logZ = lds.posterior_moments(glob, (J, h))
    assert Ex.shape == (2, 8, 2) and logZ.shape == (2,)
    # agrees with the smoother through run_inference's stats at B=1
    Ex1, _, _, _ = lds.posterior_moments(glob, (J[0], h[0]))
    np.testing.assert_allclose(np.asarray(Ex[0]), np.asarray(Ex1),
                               atol=1e-10)

    traj = lds.predict(glob, (J, h), KEY, num_steps=5, num_samples=3)
    assert traj.shape == (2, 3, 13, 2)
    assert np.all(np.isfinite(np.asarray(traj)))
    # conditioning window must be a posterior sample consistent with
    # moments: mean of many samples ~ Ex
    traj2 = lds.predict(glob, (J[0], h[0]), KEY, num_steps=2,
                        num_samples=400)
    emp = jnp.mean(traj2[:, :8], axis=0)
    sd = jnp.sqrt(jnp.maximum(jax.vmap(jnp.diag)(
        (ExxT[0] - Ex[0][..., :, None] * Ex[0][..., None, :])), 1e-10))
    assert bool(jnp.all(jnp.abs(emp - Ex[0]) < 5 * sd / np.sqrt(400) + 1e-6))


def test_pallas_backend_matches_xla_backend():
    """run_inference(backend="pallas") -- the fused differentiable kernel
    path -- must be a drop-in for the XLA scan: identical stats/KLs and
    identical gradients of an ELBO-shaped objective (interpret mode)."""
    glob, pots = _setup(B=3, T=8)

    def objective(glob_and_pots, backend):
        g, (J, h) = glob_and_pots
        samples, stats, gkl, lkl = lds.run_inference(
            glob, g, (J, h), KEY, 2, backend=backend, interpret=True)
        # eps differs between backends; touch samples only through a
        # noise-independent statistic is impossible, so compare the
        # deterministic pieces and grads of the KL channel.
        return lkl + 0.1 * gkl, (samples, stats)

    (v_p, (s_p, st_p)), g_p = jax.value_and_grad(
        lambda gp: objective(gp, "pallas"), has_aux=True)((glob, pots))
    (v_x, (s_x, st_x)), g_x = jax.value_and_grad(
        lambda gp: objective(gp, "xla"), has_aux=True)((glob, pots))

    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-9)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-9),
        st_p, st_x)
    assert s_p.shape == s_x.shape == (2, 3, 8, 2)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8),
        g_p, g_x)


def test_pallas_backend_unbatched():
    glob, (J, h) = _setup(B=2, T=6)
    s, st, gkl, lkl = lds.run_inference(glob, glob, (J[0], h[0]), KEY, 2,
                                        backend="pallas", interpret=True)
    s2, st2, gkl2, lkl2 = lds.run_inference(glob, glob, (J[0], h[0]), KEY,
                                            2, backend="xla")
    assert s.shape == s2.shape == (2, 6, 2)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-9), st, st2)
    np.testing.assert_allclose(float(lkl), float(lkl2), rtol=1e-8)


def test_online_filter_matches_batch_filter():
    """Streaming init/step replay of a sequence == batch lds_filter:
    same filtered moments at every t, and the per-frame predictive
    log-evidence increments sum to the chain logZ."""
    from svae_tpu.models import lds as lds_mod
    from svae_tpu.ops import kalman
    from svae_tpu.utils import smallchol
    from svae_tpu.utils.psd import symmetrize

    d, T = 3, 9
    key = jax.random.PRNGKey(0)
    glob = lds_mod.init_pgm_param(key, d)
    J_diag = jax.nn.softplus(
        jax.random.normal(jax.random.PRNGKey(1), (T, d))) + 0.5
    h = jax.random.normal(jax.random.PRNGKey(2), (T, d))
    dt = h.dtype

    init_fn, step_fn = lds_mod.make_online_filter(glob, dtype=dt)
    state, out0 = init_fn((J_diag[0], h[0]))
    outs = [out0]
    for t in range(1, T):
        state, out = step_fn(state, (J_diag[t], h[t]))
        outs.append(out)
    means = np.stack([np.asarray(o[0]) for o in outs])
    logevs = np.array([float(o[2]) for o in outs])

    init, pairs = lds_mod.expected_chain_potentials(glob, T, dtype=dt)
    nodes = lds_mod._node_potentials((J_diag, h))
    logZ, Jf, hf = kalman.lds_filter(init, pairs, nodes)
    want_means = np.stack([
        np.asarray(smallchol.cho_solve(smallchol.chol(symmetrize(Jf[t])),
                                       hf[t])) for t in range(T)])

    np.testing.assert_allclose(means, want_means, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(logevs.sum(), float(logZ), rtol=1e-9)

    # scan replay gives the same trajectory as the python loop
    state0, out0b = init_fn((J_diag[0], h[0]))
    _, scanned = jax.lax.scan(step_fn, state0, (J_diag[1:], h[1:]))
    np.testing.assert_allclose(np.asarray(scanned[0]), means[1:], rtol=1e-8,
                               atol=1e-9)

    # covariances are PSD and match the filtered precisions
    for t in (0, T - 1):
        cov = np.asarray(outs[t][1])
        Jt = np.asarray(symmetrize(Jf[t]))
        np.testing.assert_allclose(cov @ Jt, np.eye(d), atol=1e-6)


def test_online_filter_long_stream_stable():
    """10k-frame stream: filtered precision converges to a steady state
    (Riccati fixed point) and stays PSD -- no f32-style drift in the
    update algebra (run in the suite's f64, the drift check is algebraic)."""
    from svae_tpu.models import lds as lds_mod

    d = 3
    glob = lds_mod.init_pgm_param(jax.random.PRNGKey(0), d)
    init_fn, step_fn = lds_mod.make_online_filter(glob, dtype=jnp.float64)
    J_diag = jnp.full((d,), 1.3, jnp.float64)
    hv = jnp.zeros((d,), jnp.float64)
    state, _ = init_fn((J_diag, hv))

    def body(state, _):
        state, (mean, cov, inc) = step_fn(state, (J_diag, hv))
        return state, (state[0], inc)

    state, (Js, incs) = jax.lax.scan(body, state, None, length=10_000)
    Js = np.asarray(Js)
    # steady state: last two precisions identical to tight tolerance
    np.testing.assert_allclose(Js[-1], Js[-2], rtol=1e-10)
    # PSD throughout the tail
    w = np.linalg.eigvalsh(Js[-1])
    assert w.min() > 0
    # per-frame log-evidence converges to a constant rate
    incs = np.asarray(incs)
    np.testing.assert_allclose(incs[-1], incs[-2], rtol=1e-10)
    assert np.all(np.isfinite(incs))


def test_window_filter_matches_single_frame_steps():
    """models/streaming.make_window_filter: replaying T frames in T/W
    windows chains exactly -- identical states and per-frame outputs to T
    single-frame step_fn calls (the serving amortization layer)."""
    from svae_tpu.models import streaming

    T, W, d = 12, 4, 3
    glob = lds.init_pgm_param(jax.random.PRNGKey(0), d)
    J_diag = jax.nn.softplus(
        jax.random.normal(jax.random.PRNGKey(1), (T, d), jnp.float64)) + 0.5
    h = jax.random.normal(jax.random.PRNGKey(2), (T, d), jnp.float64)

    init_fn, step_fn = lds.make_online_filter(glob, dtype=h.dtype)
    state, out0 = init_fn((J_diag[0], h[0]))
    means, logevs = [np.asarray(out0[0])], [float(out0[2])]
    for t in range(1, T):
        state, out = step_fn(state, (J_diag[t], h[t]))
        means.append(np.asarray(out[0]))
        logevs.append(float(out[2]))

    w_init, w_step = streaming.make_window_filter(init_fn, step_fn)
    wstate, wout = jax.jit(w_init)((J_diag[:W], h[:W]))
    w_means = [np.asarray(wout[0])]
    w_logevs = [np.asarray(wout[2])]
    jw = jax.jit(w_step)
    for s in range(W, T, W):
        wstate, wout = jw(wstate, (J_diag[s:s + W], h[s:s + W]))
        w_means.append(np.asarray(wout[0]))
        w_logevs.append(np.asarray(wout[2]))
    np.testing.assert_allclose(np.concatenate(w_means), np.stack(means),
                               rtol=1e-12, atol=0)
    np.testing.assert_allclose(np.concatenate(w_logevs), np.array(logevs),
                               rtol=1e-12, atol=0)
    # the carried state equals the single-frame filter's final state
    for a, b in zip(wstate, state):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)

    # one-shot replay == W=T window
    outs = streaming.replay(init_fn, step_fn, (J_diag, h))
    np.testing.assert_allclose(np.asarray(outs[0]), np.stack(means),
                               rtol=1e-12)

    # vmapped streams compose with the window layer
    B = 3
    Jb = jax.nn.softplus(jax.random.normal(
        jax.random.PRNGKey(3), (B, T, d), jnp.float64)) + 0.5
    hb = jax.random.normal(jax.random.PRNGKey(4), (B, T, d), jnp.float64)
    vstate, vout = jax.vmap(w_init)((Jb[:, :W], hb[:, :W]))
    assert vout[0].shape == (B, W, d)
    s1, o1 = init_fn((Jb[1, 0], hb[1, 0]))
    np.testing.assert_allclose(np.asarray(vout[0][1, 0]),
                               np.asarray(o1[0]), rtol=1e-12)


def test_posterior_moments_explicit_pallas_ragged_raises():
    """An EXPLICIT backend='pallas' request with lengths= must raise, not
    silently degrade to the XLA path (round-4 advisor finding)."""
    glob, (J, h) = _setup(d=2, T=8, B=2)
    lengths = jnp.asarray([8, 5])
    with pytest.raises(ValueError, match="ragged"):
        lds.posterior_moments(glob, (J, h), lengths=lengths,
                              backend="pallas")
    # auto still serves ragged batches through the XLA path
    Ex, _, _, logZ = lds.posterior_moments(glob, (J, h), lengths=lengths)
    assert Ex.shape == (2, 8, 2) and logZ.shape == (2,)
