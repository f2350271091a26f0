"""Distributed-path tests on the 8-device virtual CPU mesh (conftest sets
xla_force_host_platform_device_count=8).

The load-bearing test: the shard_map DP train step must produce EXACTLY
(up to f64 reduction order) the same update as a hand-rolled single-device
computation that mimics the per-shard key folding -- this pins down the
natural-gradient scaling across shards (SURVEY.md hard part 6).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svae_tpu.data import make_pinwheel
from svae_tpu.models import gmm
from svae_tpu.nets import recognition, decoders
from svae_tpu.parallel import make_mesh, local_batch_size, make_dp_train_step
from svae_tpu.parallel import multihost
from svae_tpu.train import optim as optim_lib
from svae_tpu.utils.pytree import flat


def _build(K=4, d=2, d_obs=2, seed=0):
    k = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(k, 3)
    pgm_prior = gmm.init_pgm_param(k1, K, d, dtype=jnp.float64)
    pgm_params = gmm.init_pgm_param(k2, K, d, random_scale=2.0,
                                    dtype=jnp.float64)
    ka, kb = jax.random.split(k3)
    net_params = (
        recognition.init_mlp_recognize(ka, d_obs, (16,), d,
                                       dtype=jnp.float64),
        decoders.init_mlp_decode(kb, d, (16,), d_obs, dtype=jnp.float64),
    )

    def run_inf(prior, glob, pots, key, S):
        return gmm.run_inference(prior, glob, pots, key, S,
                                 num_meanfield_iters=15)

    return pgm_prior, pgm_params, net_params, run_inf


def test_mesh_shapes():
    mesh = make_mesh(data=4, mc=2)
    assert mesh.shape == {"mc": 2, "data": 4}
    assert local_batch_size(32, mesh) == 8
    with pytest.raises(ValueError):
        local_batch_size(30, mesh)
    with pytest.raises(ValueError):
        make_mesh(data=16, mc=1)


def test_dp_step_matches_manual_reference():
    pgm_prior, pgm_params, net_params, run_inf = _build()
    data = jnp.asarray(make_pinwheel(num_per_class=16), jnp.float64)
    N = data.shape[0]
    Bg = 32
    mesh = make_mesh(data=4, mc=2)
    D, M = mesh.shape["data"], mesh.shape["mc"]
    S = 2  # per-shard particles

    opt_init, dp_step = make_dp_train_step(
        run_inf, recognition.mlp_recognize, decoders.mlp_loglike,
        pgm_prior, N, mesh, Bg, num_samples=S, pgm_step_size=0.3,
        net_step_size=1e-2, donate=False)
    opt_state = opt_init(pgm_params, net_params)
    batch = data[:Bg]
    key = jax.random.PRNGKey(5)

    p_dp, n_dp, s_dp, elbo_dp, terms_dp = dp_step(pgm_params, net_params, opt_state,
                                        batch, key)

    # ---- manual single-device reference with identical per-shard keys ----
    Bl = Bg // D

    def shard_obj(net_params, shard_batch, k):
        rp, lp = net_params
        scale = N / Bg
        pots = recognition.mlp_recognize(rp, shard_batch)
        samples, stats, gkl, lkl = run_inf(pgm_prior, pgm_params, pots, k, S)
        ll = decoders.mlp_loglike(lp, samples, shard_batch)
        return (scale * (ll - lkl) - gkl / D) / N, jax.lax.stop_gradient(stats)

    elbo_total = 0.0
    gnet_total = None
    stats_total = None
    for di in range(D):
        shard_batch = batch[di * Bl:(di + 1) * Bl]
        acc_e, acc_g, acc_s = 0.0, None, None
        for mi in range(M):
            k = jax.random.fold_in(jax.random.fold_in(key, di), mi + 7919)
            (e, st), g = jax.value_and_grad(shard_obj, has_aux=True)(
                net_params, shard_batch, k)
            acc_e = acc_e + e / M
            acc_g = g if acc_g is None else jax.tree.map(
                jnp.add, acc_g, g)
            acc_s = st if acc_s is None else jax.tree.map(
                jnp.add, acc_s, st)
        acc_g = jax.tree.map(lambda x: x / M, acc_g)
        acc_s = jax.tree.map(lambda x: x / M, acc_s)
        elbo_total = elbo_total + acc_e
        gnet_total = acc_g if gnet_total is None else jax.tree.map(
            jnp.add, gnet_total, acc_g)
        stats_total = acc_s if stats_total is None else jax.tree.map(
            jnp.add, stats_total, acc_s)

    np.testing.assert_allclose(float(elbo_dp), float(elbo_total), rtol=1e-9)

    natgrad = jax.tree.map(
        lambda pr, st, pg: (pr + (N / Bg) * st - pg) / N,
        pgm_prior, stats_total, pgm_params)
    opt_init2, opt_update = optim_lib.make_optimizer(
        None, pgm_step_size=0.3, net_step_size=1e-2)
    st0 = opt_init2(pgm_params, net_params)
    p_ref, n_ref, s_ref = opt_update(st0, pgm_params, net_params, natgrad,
                                     gnet_total)
    np.testing.assert_allclose(np.asarray(flat(p_dp)),
                               np.asarray(flat(p_ref)), rtol=1e-8,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(flat(n_dp)),
                               np.asarray(flat(n_ref)), rtol=1e-7,
                               atol=1e-10)


def test_dp_training_improves_elbo():
    pgm_prior, pgm_params, net_params, run_inf = _build(seed=2)
    data = jnp.asarray(make_pinwheel(num_per_class=16), jnp.float64)
    N = data.shape[0]
    mesh = make_mesh(data=8, mc=1)
    opt_init, dp_step = make_dp_train_step(
        run_inf, recognition.mlp_recognize, decoders.mlp_loglike,
        pgm_prior, N, mesh, 40, num_samples=2, pgm_step_size=0.5,
        net_step_size=1e-2, donate=False)
    opt_state = opt_init(pgm_params, net_params)
    key = jax.random.PRNGKey(0)
    hist = []
    p, n, s = pgm_params, net_params, opt_state
    for i in range(12):
        key, k = jax.random.split(key)
        b = data[(i % 2) * 40:(i % 2) * 40 + 40]
        p, n, s, e, _ = dp_step(p, n, s, b, k)
        hist.append(float(e))
    assert all(np.isfinite(hist))
    assert np.mean(hist[-3:]) > np.mean(hist[:3])


def test_param_fingerprint_consistency_check():
    _, pgm_params, _, _ = _build()
    mesh = make_mesh(data=8, mc=1)
    diff = multihost.assert_replicated_consistent(pgm_params, mesh)
    assert diff == 0.0
    fp1 = multihost.param_fingerprint(pgm_params)
    fp2 = multihost.param_fingerprint(
        jax.tree.map(lambda a: a + 1e-3, pgm_params))
    assert float(jnp.max(jnp.abs(fp1 - fp2))) > 0


class TestInitializeFailureModel:
    """multihost.initialize wraps jax.distributed.initialize with the
    failure model of SURVEY.md section 5: bounded barrier wait surfaced as
    an actionable error, idempotent re-init, timeout plumbed through. The
    real coordination service needs a pod, so these monkeypatch the jax
    entry point."""

    def test_reinit_returns_false(self, monkeypatch):
        def boom(**kw):
            raise RuntimeError(
                "distributed.initialize should only be called once.")
        monkeypatch.setattr(jax.distributed, "initialize", boom)
        assert multihost.initialize() is False

    def test_barrier_timeout_surfaced(self, monkeypatch):
        def boom(**kw):
            raise RuntimeError(
                "DEADLINE_EXCEEDED: barrier wait timed out")
        monkeypatch.setattr(jax.distributed, "initialize", boom)
        with pytest.raises(RuntimeError, match="resume\\s+from the latest "
                           "checkpoint"):
            multihost.initialize(num_processes=4, timeout_secs=7)

    def test_other_errors_reraised(self, monkeypatch):
        def boom(**kw):
            raise RuntimeError("must be called before any JAX calls")
        monkeypatch.setattr(jax.distributed, "initialize", boom)
        with pytest.raises(RuntimeError, match="before any JAX calls"):
            multihost.initialize()

    def test_timeout_plumbed_and_success(self, monkeypatch):
        seen = {}
        monkeypatch.setattr(jax.distributed, "initialize",
                            lambda **kw: seen.update(kw))
        assert multihost.initialize(coordinator_address="h:1",
                                    num_processes=2, process_id=1,
                                    timeout_secs=11) is True
        assert seen["initialization_timeout"] == 11
        assert seen["num_processes"] == 2


def test_dp_ragged_full_lengths_equals_dense():
    """DP ragged invariance: a ragged batch whose lengths all equal T must
    produce the SAME step as the dense DP step (identical shard keys, so
    bitwise up to reduction order) -- and a mixed-lengths batch must run
    finite with pad-free transition counts."""
    from functools import partial
    from svae_tpu.models import lds as lds_model

    d, d_obs, B, T, N = 2, 4, 16, 6, 64
    k = jax.random.PRNGKey(40)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    pgm_prior = lds_model.init_pgm_param(k1, d, dtype=jnp.float64)
    pgm_params = lds_model.init_pgm_param(k2, d, dtype=jnp.float64)
    net_params = (
        recognition.init_mlp_recognize(k3, d_obs, (8,), d,
                                       dtype=jnp.float64),
        decoders.init_mlp_decode(k4, d, (8,), d_obs, dtype=jnp.float64),
    )
    data = jax.random.normal(jax.random.PRNGKey(41), (B, T, d_obs),
                             jnp.float64)
    mesh = make_mesh(data=4, mc=1)

    opt_init, dense_step = make_dp_train_step(
        lds_model.run_inference, recognition.mlp_recognize,
        decoders.mlp_loglike, pgm_prior, N, mesh, B, donate=False)
    _, ragged_step = make_dp_train_step(
        lds_model.run_inference, recognition.mlp_recognize,
        decoders.mlp_loglike, pgm_prior, N, mesh, B, donate=False,
        ragged=True)
    s0 = opt_init(pgm_params, net_params)

    key = jax.random.PRNGKey(42)
    out_d = dense_step(pgm_params, net_params, s0, data, key)
    full = jnp.full((B,), T, jnp.int32)
    out_r = ragged_step(pgm_params, net_params, s0, (data, full), key)
    for a, b in zip(jax.tree.leaves(out_d[:4]), jax.tree.leaves(out_r[:4])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-9)

    # mixed lengths: finite, and terms dict intact
    lens = jnp.asarray([T, T - 1, T - 2, 3] * (B // 4), jnp.int32)
    p2, n2, s2, elbo2, terms2 = ragged_step(pgm_params, net_params, s0,
                                            (data, lens), key)
    assert np.isfinite(float(elbo2))
    assert set(terms2) >= {"loglike", "local_kl", "global_kl",
                           "net_grad_norm"}
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree.leaves((p2, n2)))
