"""SLDS-SVAE tests. The load-bearing oracle: a K=1 SLDS is exactly an LDS,
so local KL, stats, and samples must match models/lds.py on the same
potentials."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svae_tpu.models import lds, slds

KEY = jax.random.PRNGKey(3)


def _setup(K=3, d=2, T=8, seed=0):
    glob = slds.init_pgm_param(jax.random.PRNGKey(seed), K, d,
                               dtype=jnp.float64)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed + 1))
    J = jax.nn.softplus(jax.random.normal(k1, (T, d), jnp.float64)) + 0.5
    h = jax.random.normal(k2, (T, d), jnp.float64)
    return glob, (J, h)


def test_k1_slds_reduces_to_lds():
    glob, pots = _setup(K=1, seed=4)
    init_dir, trans_dir, niw_np, mniw_np = glob
    mniw_single = jax.tree.map(lambda a: a[0], mniw_np)
    lds_glob = (niw_np, mniw_single)

    s_slds, st_slds, _, kl_slds = slds.run_inference(
        glob, glob, pots, KEY, num_samples=2, num_meanfield_iters=3)
    s_lds, st_lds, _, kl_lds = lds.run_inference(
        lds_glob, lds_glob, pots, KEY, num_samples=2)

    # K=1: HMM is deterministic, logZ_hmm = sum of energies = <L, r>, so
    # local_kl reduces to the LDS local_kl.
    np.testing.assert_allclose(float(kl_slds), float(kl_lds), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(s_slds), np.asarray(s_lds),
                               atol=1e-8)
    _, _, niw_stats_s, mniw_stats_s = st_slds
    niw_stats_l, mniw_stats_l = st_lds
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a).squeeze(), np.asarray(b), atol=1e-8),
        (niw_stats_s, mniw_stats_s), (niw_stats_l, mniw_stats_l))


def test_stats_congruent_and_counts():
    glob, pots = _setup(K=3, T=9)
    samples, stats, gkl, lkl = slds.run_inference(
        glob, glob, pots, KEY, num_samples=2, num_meanfield_iters=10)
    assert jax.tree.structure(stats) == jax.tree.structure(glob)
    init_s, trans_s, niw_s, mniw_s = stats
    T = pots[0].shape[0]
    np.testing.assert_allclose(float(jnp.sum(init_s)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(jnp.sum(trans_s)), T - 1, rtol=1e-6)
    np.testing.assert_allclose(float(jnp.sum(mniw_s[3])), T - 1, rtol=1e-6)
    assert samples.shape == (2, T, 2)


def test_local_kl_nonnegative_and_finite():
    glob, pots = _setup(K=4, T=12, seed=9)
    _, _, gkl, lkl = slds.run_inference(glob, glob, pots, KEY,
                                        num_meanfield_iters=12)
    assert np.isfinite(float(lkl)) and float(lkl) >= -1e-6
    assert abs(float(gkl)) < 1e-6  # prior == global


def test_meanfield_stationary():
    glob, pots = _setup(K=3, T=7, seed=2)
    h1, l1, kl1 = slds.local_meanfield(glob, pots, num_iters=80)
    h2, l2, kl2 = slds.local_meanfield(glob, pots, num_iters=81)
    np.testing.assert_allclose(np.asarray(h1[1]), np.asarray(h2[1]),
                               atol=1e-7)
    np.testing.assert_allclose(float(kl1), float(kl2), rtol=1e-7)


def test_sequential_and_parallel_agree():
    glob, pots = _setup(K=3, T=8, seed=5)
    s1, st1, _, l1 = slds.run_inference(glob, glob, pots, KEY, 2,
                                        num_meanfield_iters=6, parallel=True)
    s2, st2, _, l2 = slds.run_inference(glob, glob, pots, KEY, 2,
                                        num_meanfield_iters=6,
                                        parallel=False)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-7)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-7)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=1e-7),
        st1, st2)


def test_batched_matches_sum_of_sequences():
    glob, _ = _setup(K=2, T=6)
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    J = jax.nn.softplus(jax.random.normal(k1, (3, 6, 2), jnp.float64)) + 0.5
    h = jax.random.normal(k2, (3, 6, 2), jnp.float64)
    _, stats_b, _, kl_b = slds.run_inference(glob, glob, (J, h), KEY,
                                             num_meanfield_iters=5)
    keys = jax.random.split(KEY, 3)
    kls, stats_list = [], []
    for b in range(3):
        _, st, _, kl = slds.run_inference(glob, glob, (J[b], h[b]),
                                          keys[b], num_meanfield_iters=5)
        kls.append(float(kl))
        stats_list.append(st)
    np.testing.assert_allclose(float(kl_b), sum(kls), rtol=1e-7)
    summed = jax.tree.map(lambda *xs: sum(np.asarray(x) for x in xs),
                          *stats_list)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), b, atol=1e-7),
        stats_b, summed)


def test_gradients_flow_and_finite():
    glob, pots = _setup(K=2, T=6, seed=6)

    def f(pots):
        _, _, _, kl = slds.run_inference(glob, glob, pots, KEY,
                                         num_meanfield_iters=8,
                                         num_diff_iters=1)
        return kl

    g = jax.grad(f)(pots)
    for leaf in jax.tree.leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_sample_states_shapes_and_validity():
    glob, pots = _setup(K=3, T=10, seed=8)
    z = slds.sample_states(glob, pots, jax.random.PRNGKey(0),
                           num_samples=(5,), num_meanfield_iters=5)
    assert z.shape == (5, 10)
    zn = np.asarray(z)
    assert zn.min() >= 0 and zn.max() < 3
    # with identical key, deterministic
    z2 = slds.sample_states(glob, pots, jax.random.PRNGKey(0),
                            num_samples=(5,), num_meanfield_iters=5)
    np.testing.assert_array_equal(zn, np.asarray(z2))


def test_pallas_backend_matches_xla_backend():
    """backend="pallas" (fused-kernel structured mean-field, bpairs
    layout) must reproduce the vmapped XLA path: stats, local KL, and
    gradients of the KL channel (interpret mode)."""
    glob, (J1, h1) = _setup(K=3, d=2, T=7, seed=2)
    _, (J2, h2) = _setup(K=3, d=2, T=7, seed=5)
    pots = (jnp.stack([J1, J2]), jnp.stack([h1, h2]))

    def objective(g_pots, backend):
        g, p = g_pots
        s, st, gkl, lkl = slds.run_inference(
            glob, g, p, KEY, num_samples=2, num_meanfield_iters=4,
            num_diff_iters=1, backend=backend, interpret=True)
        return lkl + 0.1 * gkl, (s, st)

    (v_p, (s_p, st_p)), g_p = jax.value_and_grad(
        lambda gp: objective(gp, "pallas"), has_aux=True)((glob, pots))
    (v_x, (s_x, st_x)), g_x = jax.value_and_grad(
        lambda gp: objective(gp, "xla"), has_aux=True)((glob, pots))

    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-8)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-9),
        st_p, st_x)
    assert s_p.shape == s_x.shape == (2, 2, 7, 2)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-8),
        g_p, g_x)


def test_most_likely_states_valid_and_consistent():
    """most_likely_states returns an int path in range; in a sharply
    determined posterior it agrees with the node-marginal argmax."""
    from svae_tpu.models import slds as slds_mod

    K, d, T = 3, 2, 12
    key = jax.random.PRNGKey(0)
    glob = slds_mod.init_pgm_param(key, K, d)
    J = jax.nn.softplus(jax.random.normal(jax.random.PRNGKey(1), (T, d))) + 0.5
    h = 3.0 * jax.random.normal(jax.random.PRNGKey(2), (T, d))
    path = slds_mod.most_likely_states(glob, (J, h), num_meanfield_iters=8)
    assert path.shape == (T,) and path.dtype == jnp.int32
    assert int(path.min()) >= 0 and int(path.max()) < K

    hmm_post, _, _ = slds_mod.local_meanfield(glob, (J, h), num_iters=8,
                                              num_diff_iters=0)
    _, r, _, _ = hmm_post
    # Viterbi and marginal argmax agree wherever the marginal is decisive
    decisive = np.asarray(r.max(axis=-1)) > 0.9
    agree = np.asarray(path) == np.asarray(jnp.argmax(r, axis=-1))
    assert np.all(agree[decisive])


def test_predict_shapes_and_sanity():
    """Forecast API: conditioning-window samples + switching rollout.
    Shapes, dtypes, state-range validity, and finiteness; the rollout must
    actually move (nonzero process noise)."""
    K, d, T, F, S = 3, 2, 8, 5, 4
    glob, (J, h) = _setup(K=K, d=d, T=T)
    x_traj, z_traj = slds.predict(glob, (J, h), KEY, num_steps=F,
                                  num_samples=S, num_meanfield_iters=3)
    assert x_traj.shape == (S, T + F, d)
    assert z_traj.shape == (S, T + F)
    assert z_traj.dtype == jnp.int32
    assert np.all(np.isfinite(np.asarray(x_traj)))
    zv = np.asarray(z_traj)
    assert zv.min() >= 0 and zv.max() < K
    # forecast frames differ across samples (noise is alive)
    fut = np.asarray(x_traj[:, T:, :])
    assert np.std(fut, axis=0).max() > 1e-6

    # batched: leading B axis
    Jb = jnp.stack([J, J * 1.1])
    hb = jnp.stack([h, h * 0.9])
    xb, zb = slds.predict(glob, (Jb, hb), KEY, num_steps=F, num_samples=S,
                          num_meanfield_iters=2)
    assert xb.shape == (2, S, T + F, d)
    assert zb.shape == (2, S, T + F)


def test_predict_k1_matches_lds_dynamics_stats():
    """K=1 switching forecast must follow the same posterior-mean dynamics
    as the LDS forecaster (single regime: same E[A], E[Sigma])."""
    from svae_tpu.expfam import mniw

    d, T = 2, 6
    glob, (J, h) = _setup(K=1, d=d, T=T)
    _, _, niw_np, mniw_np = glob
    A_slds, Sig_slds = mniw.posterior_mean_params(mniw_np)
    lds_glob = (niw_np, jax.tree.map(lambda a: a[0], mniw_np))
    A_lds, Sig_lds = mniw.posterior_mean_params(lds_glob[1])
    np.testing.assert_allclose(np.asarray(A_slds[0]), np.asarray(A_lds))
    np.testing.assert_allclose(np.asarray(Sig_slds[0]), np.asarray(Sig_lds))


def test_segmentation_apis_accept_mask():
    K, d, T = 2, 2, 6
    glob, (J, h) = _setup(K=K, d=d, T=T)
    mask = jnp.ones((T,)).at[2].set(0.0)
    path = slds.most_likely_states(glob, (J, h), num_meanfield_iters=2,
                                   mask=mask)
    assert path.shape == (T,) and int(path.max()) < K
    zs = slds.sample_states(glob, (J, h), KEY, num_samples=3,
                            num_meanfield_iters=2, mask=mask)
    assert zs.shape == (3, T) and int(zs.max()) < K
    # masked call == manual zeroing (decode is deterministic)
    path_manual = slds.most_likely_states(
        glob, lds.mask_potentials((J, h), mask), num_meanfield_iters=2)
    np.testing.assert_array_equal(np.asarray(path), np.asarray(path_manual))


def test_online_filter_k1_matches_lds_online_filter():
    """At K=1 the GPB2 collapse is exact: regime weight 1, and the
    (mean, cov, logev) stream reproduces lds.make_online_filter."""
    d, T = 3, 10
    glob, (J, h) = _setup(K=1, d=d, T=T, seed=7)
    _, _, niw_np, mniw_np = glob
    lds_glob = (niw_np, jax.tree.map(lambda a: a[0], mniw_np))

    s_init, s_step = slds.make_online_filter(glob, dtype=jnp.float64)
    l_init, l_step = lds.make_online_filter(lds_glob, dtype=jnp.float64)

    s_state, (w, sm, sc, sev) = s_init((J[0], h[0]))
    l_state, (lm, lc, lev) = l_init((J[0], h[0]))
    np.testing.assert_allclose(np.asarray(w), [1.0], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(sm), np.asarray(lm), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(sc), np.asarray(lc), rtol=1e-9)
    np.testing.assert_allclose(float(sev), float(lev), rtol=1e-9)
    for t in range(1, T):
        s_state, (w, sm, sc, sev) = s_step(s_state, (J[t], h[t]))
        l_state, (lm, lc, lev) = l_step(l_state, (J[t], h[t]))
        np.testing.assert_allclose(np.asarray(w), [1.0], rtol=1e-12)
        np.testing.assert_allclose(np.asarray(sm), np.asarray(lm),
                                   rtol=1e-7, atol=1e-10)
        np.testing.assert_allclose(np.asarray(sc), np.asarray(lc),
                                   rtol=1e-7, atol=1e-10)
        np.testing.assert_allclose(float(sev), float(lev), rtol=1e-7)


def test_online_filter_properties_and_scan_replay():
    """K=3: weights normalized, covs PSD, logev finite; lax.scan replay
    matches the python loop (the serving deployment shape)."""
    K, d, T = 3, 2, 12
    glob, (J, h) = _setup(K=K, d=d, T=T, seed=11)
    init_fn, step_fn = slds.make_online_filter(glob, dtype=jnp.float64)

    state, out0 = init_fn((J[0], h[0]))
    outs = [out0]
    for t in range(1, T):
        state, out = step_fn(state, (J[t], h[t]))
        outs.append(out)
    for w, m, c, ev in outs:
        np.testing.assert_allclose(float(jnp.sum(w)), 1.0, rtol=1e-8)
        assert np.all(np.linalg.eigvalsh(np.asarray(c)) > 0)
        assert np.isfinite(float(ev)) and np.all(np.isfinite(np.asarray(m)))

    state0, _ = init_fn((J[0], h[0]))
    _, scanned = jax.lax.scan(step_fn, state0, (J[1:], h[1:]))
    np.testing.assert_allclose(
        np.asarray(scanned[0]),
        np.stack([np.asarray(o[0]) for o in outs[1:]]), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(scanned[3]),
        np.array([float(o[3]) for o in outs[1:]]), rtol=1e-9)


def test_online_filter_recovers_regimes():
    """Two well-separated rotation regimes, strong evidence: the streaming
    regime posterior must track the true generating regime on a long
    majority of frames (it is causal, so allow switch-lag errors)."""
    K, d, T = 2, 2, 60
    th = jnp.pi / 8
    rot = lambda a, s: s * jnp.array(
        [[jnp.cos(a), -jnp.sin(a)], [jnp.sin(a), jnp.cos(a)]], jnp.float64)
    As = jnp.stack([rot(th, 0.99), rot(-th, 0.6)])
    glob = slds.init_pgm_param(jax.random.PRNGKey(0), K, d,
                               kappa_sticky=20.0, mniw_conc=200.0,
                               dtype=jnp.float64)
    init_dir, trans_dir, niw_np, mniw_np = glob
    # recenter each MNIW factor at its regime's dynamics matrix
    from svae_tpu.expfam import mniw as mniw_mod
    S, M, V, nu = mniw_mod.natural_to_standard(mniw_np)
    mniw_np = mniw_mod.standard_to_natural(S, As, V, nu)
    glob = (init_dir, trans_dir, niw_np, mniw_np)

    # simulate: regime 0 for the first half, regime 1 for the second
    zs = np.array([0] * (T // 2) + [1] * (T - T // 2))
    xs = np.zeros((T, d))
    xs[0] = np.array([2.0, 0.0])
    rng = np.random.default_rng(3)
    for t in range(1, T):
        xs[t] = np.asarray(As[zs[t]]) @ xs[t - 1] + 0.05 * rng.normal(size=d)
    # near-delta evidence on the true x
    Jd = jnp.full((T, d), 400.0, jnp.float64)
    hv = jnp.asarray(xs) * Jd

    init_fn, step_fn = slds.make_online_filter(glob, dtype=jnp.float64)
    state, out = init_fn((Jd[0], hv[0]))
    hits = []
    for t in range(1, T):
        state, (w, m, c, ev) = step_fn(state, (Jd[t], hv[t]))
        hits.append(int(np.argmax(np.asarray(w))) == zs[t])
    assert np.mean(hits) > 0.8, f"regime hit rate {np.mean(hits):.2f}"


def test_window_filter_matches_single_frame_steps_slds():
    """The window/replay layer is filter-agnostic: wrapping the GPB2
    switching filter chains exactly across window boundaries too."""
    from svae_tpu.models import streaming

    T, W, K, d = 8, 4, 3, 2
    glob = slds.init_pgm_param(jax.random.PRNGKey(0), K, d)
    J_diag = jax.nn.softplus(
        jax.random.normal(jax.random.PRNGKey(1), (T, d), jnp.float64)) + 0.5
    h = jax.random.normal(jax.random.PRNGKey(2), (T, d), jnp.float64)

    init_fn, step_fn = slds.make_online_filter(glob, dtype=h.dtype)
    state, out0 = init_fn((J_diag[0], h[0]))
    outs = [out0]
    for t in range(1, T):
        state, out = step_fn(state, (J_diag[t], h[t]))
        outs.append(out)

    w_init, w_step = streaming.make_window_filter(init_fn, step_fn)
    wstate, wout1 = w_init((J_diag[:W], h[:W]))
    wstate, wout2 = w_step(wstate, (J_diag[W:], h[W:]))
    got = jax.tree.map(
        lambda a, b: np.concatenate([np.asarray(a), np.asarray(b)]),
        wout1, wout2)
    want = jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]),
                        *outs)
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(g, w, rtol=1e-12, atol=0)
    for a, b in zip(jax.tree.leaves(wstate), jax.tree.leaves(state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)
