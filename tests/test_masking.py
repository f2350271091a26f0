"""Missing observations and ragged (padded) minibatches.

The contract under test (models/lds.py mask=/lengths=, data/masking.py,
decoders mask=, elbo mask_fn=):

  * evidence mask: a masked frame contributes NO evidence -- the smoother
    bridges it through the dynamics (correct EM missing-data treatment;
    stats still cover every frame);
  * lengths (trailing padding): pad frames contribute no evidence AND are
    excluded from the MNIW stats/counts, so a padded ragged batch trains
    EXACTLY like the unpadded sequences (logZ / local KL / stats equal).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svae_tpu.data import masking
from svae_tpu.models import lds
from svae_tpu.nets import decoders
from svae_tpu.train import elbo as elbo_lib


def _potentials(key, B, T, d, dtype=jnp.float64):
    k1, k2 = jax.random.split(key)
    J = jax.nn.softplus(jax.random.normal(k1, (B, T, d), dtype)) + 0.3
    h = jax.random.normal(k2, (B, T, d), dtype)
    return J, h


def _global(key, d):
    return lds.init_pgm_param(key, d, dtype=jnp.float64)


# ---------------------------------------------------------------------------
# evidence masks
# ---------------------------------------------------------------------------


def test_mask_potentials_zeroes_masked_frames():
    J, h = _potentials(jax.random.PRNGKey(0), 2, 6, 3)
    mask = jnp.array([[1, 1, 0, 1, 0, 1], [1, 0, 1, 1, 1, 1]], jnp.float64)
    Jm, hm = lds.mask_potentials((J, h), mask)
    assert Jm.shape == J.shape and hm.shape == h.shape
    np.testing.assert_allclose(np.asarray(Jm[0, 2]), 0.0)
    np.testing.assert_allclose(np.asarray(hm[1, 1]), 0.0)
    np.testing.assert_allclose(np.asarray(Jm[0, 1]), np.asarray(J[0, 1]))
    # boolean masks work too
    Jb, _ = lds.mask_potentials((J, h), mask.astype(bool))
    np.testing.assert_allclose(np.asarray(Jb), np.asarray(Jm))


def test_masked_inference_equals_manually_zeroed_potentials():
    d, T = 3, 9
    gnp = _global(jax.random.PRNGKey(1), d)
    J, h = _potentials(jax.random.PRNGKey(2), 1, T, d)
    J, h = J[0], h[0]
    mask = jnp.array([1, 1, 0, 1, 1, 0, 0, 1, 1], jnp.float64)
    key = jax.random.PRNGKey(3)

    out_mask = lds.run_inference(gnp, gnp, (J, h), key, num_samples=2,
                                 mask=mask)
    out_manual = lds.run_inference(
        gnp, gnp, lds.mask_potentials((J, h), mask), key, num_samples=2)
    for a, b in zip(jax.tree.leaves(out_mask), jax.tree.leaves(out_manual)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_missing_frames_are_bridged_not_broken():
    """Posterior at a missing frame: finite, and its covariance is wider
    than at the same frame when observed (less evidence => more spread)."""
    d, T = 2, 12
    gnp = _global(jax.random.PRNGKey(4), d)
    J, h = _potentials(jax.random.PRNGKey(5), 1, T, d)
    J, h = J[0], h[0]
    mask = jnp.ones((T,)).at[5].set(0.0)

    Ex_m, ExxT_m, _, logZ_m = lds.posterior_moments(gnp, (J, h), mask=mask)
    Ex_o, ExxT_o, _, logZ_o = lds.posterior_moments(gnp, (J, h))
    assert np.isfinite(np.asarray(Ex_m)).all()
    cov_m = np.asarray(ExxT_m[5] - jnp.outer(Ex_m[5], Ex_m[5]))
    cov_o = np.asarray(ExxT_o[5] - jnp.outer(Ex_o[5], Ex_o[5]))
    assert np.trace(cov_m) > np.trace(cov_o)
    assert float(logZ_m) != float(logZ_o)


# ---------------------------------------------------------------------------
# ragged batches (lengths=)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_padded_batch_matches_unpadded_sequences(backend):
    """The load-bearing ragged-batch theorem: pad + lengths= reproduces the
    unpadded per-sequence stats, local KL, and first-frame stats exactly."""
    d = 3
    T1, T2 = 6, 10
    gnp = _global(jax.random.PRNGKey(6), d)
    J_full, h_full = _potentials(jax.random.PRNGKey(7), 2, T2, d)
    # sequence 0 really has T1 frames; pad region is garbage on purpose
    seq0 = (J_full[0, :T1], h_full[0, :T1])
    seq1 = (J_full[1], h_full[1])

    interp = dict(interpret=True) if backend == "pallas" else {}
    key = jax.random.PRNGKey(8)

    # unpadded per-sequence runs (batched calls of batch-size one keep the
    # stats/counting conventions identical across backends)
    outs = []
    for (Js, hs), Ts in ((seq0, T1), (seq1, T2)):
        o = lds.run_inference(gnp, gnp, (Js[None], hs[None]), key,
                              num_samples=1, backend=backend, **interp)
        outs.append(o)
    stats_ref = jax.tree.map(lambda a, b: a + b, outs[0][1], outs[1][1])
    lkl_ref = outs[0][3] + outs[1][3]

    # padded ragged batch
    lengths = jnp.array([T1, T2])
    _, stats_pad, _, lkl_pad = lds.run_inference(
        gnp, gnp, (J_full, h_full), key, num_samples=1,
        backend=backend, lengths=lengths, **interp)

    tol = dict(rtol=1e-9, atol=1e-9) if backend == "xla" else \
        dict(rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves(stats_pad), jax.tree.leaves(stats_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), **tol)
    np.testing.assert_allclose(float(lkl_pad), float(lkl_ref), **tol)


def test_lengths_transition_count():
    d, B, T = 2, 3, 8
    gnp = _global(jax.random.PRNGKey(9), d)
    J, h = _potentials(jax.random.PRNGKey(10), B, T, d)
    lengths = jnp.array([3, 8, 5])
    _, (niw_stats, mniw_stats), _, _ = lds.run_inference(
        gnp, gnp, (J, h), jax.random.PRNGKey(11), lengths=lengths)
    assert float(mniw_stats[3]) == pytest.approx(float((lengths - 1).sum()))
    assert float(niw_stats[2]) == pytest.approx(B)


def test_lengths_requires_batched():
    d, T = 2, 5
    gnp = _global(jax.random.PRNGKey(12), d)
    J, h = _potentials(jax.random.PRNGKey(13), 1, T, d)
    with pytest.raises(ValueError):
        lds.run_inference(gnp, gnp, (J[0], h[0]), jax.random.PRNGKey(0),
                          lengths=jnp.array([T]))


def test_pad_batch_helper():
    rng = np.random.RandomState(0)
    seqs = [rng.randn(4, 3), rng.randn(7, 3), rng.randn(2, 3)]
    batch, lengths = masking.pad_batch(seqs)
    assert batch.shape == (3, 7, 3)
    np.testing.assert_array_equal(lengths, [4, 7, 2])
    np.testing.assert_allclose(batch[0, :4], seqs[0])
    np.testing.assert_allclose(batch[0, 4:], 0.0)
    with pytest.raises(ValueError):
        masking.pad_batch(seqs, T=3)


# ---------------------------------------------------------------------------
# decoder loglike masking + NaN pipeline
# ---------------------------------------------------------------------------


def test_masked_loglike_drops_missing_frames():
    key = jax.random.PRNGKey(14)
    params = decoders.init_linear_decode(key, 3, 4, dtype=jnp.float64)
    samples = jax.random.normal(key, (2, 5, 7, 3), jnp.float64)  # (S,B,T,d)
    y = jax.random.normal(jax.random.PRNGKey(15), (5, 7, 4), jnp.float64)
    mask = (jax.random.uniform(jax.random.PRNGKey(16), (5, 7)) > 0.3
            ).astype(jnp.float64)
    ll_m = decoders.linear_loglike(params, samples, y, mask=mask)
    # reference: zero-out via explicit per-frame evaluation
    mu, lsq = decoders.linear_decode(params, samples)
    per = decoders.diag_gaussian_loglike(y, mu, lsq).mean(0)
    np.testing.assert_allclose(float(ll_m), float((per * mask).sum()),
                               rtol=1e-12)


def test_nan_mask_and_end_to_end_gradfun():
    """NaN-marked frames through the full objective: finite ELBO/grads,
    and exactly equal to the explicitly-masked objective."""
    d_obs, d, B, T, N = 4, 2, 3, 6, 30
    key = jax.random.PRNGKey(17)
    gnp = _global(key, d)

    from svae_tpu.nets import recognition
    recog_p = recognition.init_linear_recognize(
        jax.random.PRNGKey(18), d_obs, d, dtype=jnp.float64)
    dec_p = decoders.init_linear_decode(
        jax.random.PRNGKey(19), d, d_obs, dtype=jnp.float64)

    data = jax.random.normal(jax.random.PRNGKey(20), (B, T, d_obs),
                             jnp.float64)
    data = data.at[0, 2].set(jnp.nan).at[2, 5].set(jnp.inf)

    gradfun = elbo_lib.make_gradfun(
        lds.run_inference, recognition.linear_recognize,
        decoders.linear_loglike, gnp, N, mask_fn=masking.nan_mask)
    elbo, natgrad, net_grads, terms = gradfun(
        gnp, (recog_p, dec_p), data, jax.random.PRNGKey(21))
    leaves = jax.tree.leaves((elbo, natgrad, net_grads))
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)

    # equivalence with the manual masked pipeline
    clean, mask = masking.nan_mask(data)
    pots = recognition.linear_recognize(recog_p, clean)
    out_a = lds.run_inference(gnp, gnp, pots, jax.random.PRNGKey(21),
                              mask=mask)
    objective = elbo_lib.make_objective(
        lds.run_inference, recognition.linear_recognize,
        decoders.linear_loglike, gnp, N, mask_fn=masking.nan_mask)
    elbo2, _ = objective(gnp, (recog_p, dec_p), data, jax.random.PRNGKey(21))
    ll = decoders.linear_loglike(dec_p, out_a[0], clean, mask=mask)
    manual = (N / B) * (ll - out_a[3]) - out_a[2]
    np.testing.assert_allclose(float(elbo2), float(manual) / N, rtol=1e-10)


# ---------------------------------------------------------------------------
# SLDS evidence mask
# ---------------------------------------------------------------------------


def test_slds_mask_equals_manual_zeroing():
    from svae_tpu.models import slds

    K, d, T = 2, 2, 7
    gnp = slds.init_pgm_param(jax.random.PRNGKey(22), K, d)
    gnp = jax.tree.map(lambda a: a.astype(jnp.float64), gnp)
    J, h = _potentials(jax.random.PRNGKey(23), 1, T, d)
    J, h = J[0], h[0]
    mask = jnp.ones((T,)).at[3].set(0.0)
    key = jax.random.PRNGKey(24)

    out_m = slds.run_inference(gnp, gnp, (J, h), key, num_samples=1,
                               num_meanfield_iters=3, mask=mask)
    out_z = slds.run_inference(gnp, gnp, lds.mask_potentials((J, h), mask),
                               key, num_samples=1, num_meanfield_iters=3)
    for a, b in zip(jax.tree.leaves(out_m), jax.tree.leaves(out_z)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# streaming + forecasting with missing frames
# ---------------------------------------------------------------------------


def test_online_filter_missing_frame_matches_masked_batch():
    """Serving-side missing data: feeding ZERO potentials for a dropped
    frame makes the streaming filter do a predict-only update that exactly
    matches the batch smoother's filtered messages under mask=."""
    from svae_tpu.ops import kalman
    from svae_tpu.utils import smallchol
    from svae_tpu.utils.psd import symmetrize

    d, T = 3, 8
    gnp = _global(jax.random.PRNGKey(25), d)
    J, h = _potentials(jax.random.PRNGKey(26), 1, T, d)
    J, h = J[0], h[0]
    mask = jnp.ones((T,)).at[2].set(0.0).at[5].set(0.0)

    init_fn, step_fn = lds.make_online_filter(gnp, dtype=jnp.float64)
    zero = (jnp.zeros((d,), jnp.float64), jnp.zeros((d,), jnp.float64))
    state, out0 = init_fn((J[0], h[0]))
    means = [np.asarray(out0[0])]
    for t in range(1, T):
        pot = zero if float(mask[t]) == 0.0 else (J[t], h[t])
        state, out = step_fn(state, pot)
        means.append(np.asarray(out[0]))

    Jm, hm = lds.mask_potentials((J, h), mask)
    init, pairs = lds.expected_chain_potentials(gnp, T, dtype=jnp.float64)
    nodes = lds._node_potentials((Jm, hm))
    _, Jf, hf = kalman.lds_filter(init, pairs, nodes)
    for t in range(T):
        want = np.asarray(smallchol.cho_solve(
            smallchol.chol(symmetrize(Jf[t])), hf[t]))
        np.testing.assert_allclose(means[t], want, rtol=1e-9, atol=1e-10)


def test_predict_with_mask_runs_and_matches_manual():
    d, T = 2, 6
    gnp = _global(jax.random.PRNGKey(27), d)
    J, h = _potentials(jax.random.PRNGKey(28), 1, T, d)
    J, h = J[0], h[0]
    mask = jnp.ones((T,)).at[4].set(0.0)
    key = jax.random.PRNGKey(29)
    xs_m = lds.predict(gnp, (J, h), key, num_steps=3, num_samples=2,
                       mask=mask)
    xs_z = lds.predict(gnp, lds.mask_potentials((J, h), mask), key,
                       num_steps=3, num_samples=2)
    assert xs_m.shape == (2, T + 3, d)
    np.testing.assert_allclose(np.asarray(xs_m), np.asarray(xs_z))


# ---------------------------------------------------------------------------
# data-parallel masked step (virtual 8-device mesh)
# ---------------------------------------------------------------------------


def test_dp_step_mask_fn_wiring():
    """make_dp_train_step(mask_fn=): identity on NaN-free data (mask all
    ones) and finite updates on NaN-marked data across the shard_map mesh."""
    from svae_tpu.parallel import make_mesh, make_dp_train_step
    from svae_tpu.nets import recognition

    d_obs, d, T, Bg, N = 4, 2, 6, 8, 32
    mesh = make_mesh(data=4, mc=2)
    key = jax.random.PRNGKey(40)
    gnp = _global(key, d)
    rp = recognition.init_linear_recognize(jax.random.PRNGKey(41), d_obs, d,
                                           dtype=jnp.float64)
    dp_ = decoders.init_linear_decode(jax.random.PRNGKey(42), d, d_obs,
                                      dtype=jnp.float64)
    data = jax.random.normal(jax.random.PRNGKey(43), (Bg, T, d_obs),
                             jnp.float64)

    def build(mask_fn):
        return make_dp_train_step(
            lds.run_inference, recognition.linear_recognize,
            decoders.linear_loglike, gnp, N, mesh, Bg,
            donate=False, mask_fn=mask_fn)

    init_a, step_a = build(None)
    init_b, step_b = build(masking.nan_mask)
    opt = init_a(gnp, (rp, dp_))
    kstep = jax.random.PRNGKey(44)
    out_a = step_a(gnp, (rp, dp_), opt, data, kstep)
    out_b = step_b(gnp, (rp, dp_), opt, data, kstep)
    for a, b in zip(jax.tree.leaves(out_a[:4]), jax.tree.leaves(out_b[:4])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-12)

    data_nan = data.at[0, 3].set(jnp.nan)
    out_c = step_b(gnp, (rp, dp_), opt, data_nan, kstep)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree.leaves(out_c[:4]))


# ---------------------------------------------------------------------------
# SLDS ragged batches (lengths=)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_slds_padded_batch_matches_unpadded_sequences(backend):
    """SLDS ragged-batch theorem: pad + lengths= reproduces the unpadded
    per-sequence stats and local KL exactly. Pad transitions become
    normalized dummies on BOTH chains (N(0,I) continuous / uniform rows
    discrete), so the structured mean-field fixed point on real frames is
    untouched and every M-step stat excludes the pads."""
    from svae_tpu.models import slds

    K, d = 3, 2
    T1, T2 = 5, 9
    gnp = slds.init_pgm_param(jax.random.PRNGKey(30), K, d)
    gnp = jax.tree.map(lambda a: a.astype(jnp.float64), gnp)
    J_full, h_full = _potentials(jax.random.PRNGKey(31), 2, T2, d)
    seq0 = (J_full[0, :T1], h_full[0, :T1])
    seq1 = (J_full[1], h_full[1])

    interp = dict(interpret=True) if backend == "pallas" else {}
    key = jax.random.PRNGKey(32)
    mf = dict(num_meanfield_iters=3, num_diff_iters=1)

    outs = []
    for (Js, hs), Ts in ((seq0, T1), (seq1, T2)):
        o = slds.run_inference(gnp, gnp, (Js[None], hs[None]), key,
                               num_samples=1, backend=backend, **mf,
                               **interp)
        outs.append(o)
    stats_ref = jax.tree.map(lambda a, b: a + b, outs[0][1], outs[1][1])
    lkl_ref = outs[0][3] + outs[1][3]

    lengths = jnp.array([T1, T2])
    _, stats_pad, _, lkl_pad = slds.run_inference(
        gnp, gnp, (J_full, h_full), key, num_samples=1,
        backend=backend, lengths=lengths, **mf, **interp)

    tol = dict(rtol=1e-8, atol=1e-9) if backend == "xla" else \
        dict(rtol=2e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(stats_pad), jax.tree.leaves(stats_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), **tol)
    np.testing.assert_allclose(float(lkl_pad), float(lkl_ref), **tol)


def test_slds_lengths_transition_count():
    """Pad transitions leave the Dirichlet and MNIW counts: the summed
    transition-pair stat and the per-state MNIW counts total len-1 per
    sequence."""
    from svae_tpu.models import slds

    K, d, B, T = 2, 2, 3, 7
    gnp = slds.init_pgm_param(jax.random.PRNGKey(33), K, d)
    gnp = jax.tree.map(lambda a: a.astype(jnp.float64), gnp)
    J, h = _potentials(jax.random.PRNGKey(34), B, T, d)
    lengths = jnp.array([4, 7, 2])
    _, stats, _, _ = slds.run_inference(
        gnp, gnp, (J, h), jax.random.PRNGKey(35), num_samples=1,
        num_meanfield_iters=2, lengths=lengths)
    init_s, trans_s, niw_s, mniw_s = stats
    expect = float((lengths - 1).sum())
    assert float(jnp.sum(trans_s)) == pytest.approx(expect, rel=1e-6)
    assert float(jnp.sum(mniw_s[3])) == pytest.approx(expect, rel=1e-6)
    assert float(jnp.sum(init_s)) == pytest.approx(B, rel=1e-6)


def test_slds_ragged_gradient_matches_unpadded():
    """The padding theorem extends to gradients: d(local_kl)/d(globals) of
    a padded ragged batch equals the sum of the unpadded per-sequence
    gradients (every op on real frames is identical; dummies are
    constant)."""
    from svae_tpu.models import slds

    K, d = 2, 2
    T1, T2 = 4, 7
    gnp = slds.init_pgm_param(jax.random.PRNGKey(50), K, d)
    gnp = jax.tree.map(lambda a: a.astype(jnp.float64), gnp)
    J_full, h_full = _potentials(jax.random.PRNGKey(51), 2, T2, d)
    key = jax.random.PRNGKey(52)
    mf = dict(num_samples=1, num_meanfield_iters=2, num_diff_iters=1)

    def lkl_pad(g):
        return slds.run_inference(
            g, g, (J_full, h_full), key, lengths=jnp.array([T1, T2]),
            **mf)[3]

    def lkl_ref(g):
        a = slds.run_inference(
            g, g, (J_full[:1, :T1], h_full[:1, :T1]), key, **mf)[3]
        b = slds.run_inference(
            g, g, (J_full[1:], h_full[1:]), key, **mf)[3]
        return a + b

    gp = jax.grad(lkl_pad)(gnp)
    gr = jax.grad(lkl_ref)(gnp)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-7, atol=1e-9)
