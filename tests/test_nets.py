"""Tests for the neural-net layer: shapes, head semantics, and decoder
log-likelihood against a hand-computed density."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svae_tpu.nets import mlp, recognition, decoders


def test_mlp_shapes_and_heads():
    key = jax.random.PRNGKey(0)
    params = mlp.init_gaussian_mlp(key, (4, 8, 3), dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(1), (7, 4), jnp.float64)
    hidden, head = params
    h = mlp.mlp(hidden, x)
    assert h.shape == (7, 8)
    J, hv = mlp.gaussian_info_head(head, h)
    assert J.shape == (7, 3) and hv.shape == (7, 3)
    assert np.all(np.asarray(J) > 0)  # precisions positive
    mu, ls = mlp.gaussian_mean_head(head, h)
    assert mu.shape == (7, 3) and ls.shape == (7, 3)


def test_recognize_batch_axes():
    key = jax.random.PRNGKey(0)
    params = recognition.init_mlp_recognize(key, 5, (16,), 2,
                                            dtype=jnp.float64)
    data = jax.random.normal(jax.random.PRNGKey(1), (3, 11, 5), jnp.float64)
    J, h = recognition.mlp_recognize(params, data)
    assert J.shape == (3, 11, 2) and h.shape == (3, 11, 2)


def test_diag_gaussian_loglike_matches_manual():
    rng = np.random.RandomState(0)
    y = rng.randn(6, 4)
    mu = rng.randn(6, 4)
    ls = rng.randn(6, 4)
    got = np.asarray(decoders.diag_gaussian_loglike(
        jnp.asarray(y), jnp.asarray(mu), jnp.asarray(ls)))
    var = np.exp(ls)
    want = np.sum(
        -0.5 * ((y - mu) ** 2 / var + ls + np.log(2 * np.pi)), axis=-1
    )
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_mlp_loglike_mc_average_over_samples():
    key = jax.random.PRNGKey(0)
    params = decoders.init_mlp_decode(key, 2, (8,), 5, dtype=jnp.float64)
    y = jax.random.normal(jax.random.PRNGKey(1), (9, 5), jnp.float64)
    x1 = jax.random.normal(jax.random.PRNGKey(2), (9, 2), jnp.float64)
    x2 = jax.random.normal(jax.random.PRNGKey(3), (9, 2), jnp.float64)
    ll1 = decoders.mlp_loglike(params, x1, y)
    ll2 = decoders.mlp_loglike(params, x2, y)
    both = decoders.mlp_loglike(params, jnp.stack([x1, x2]), y)
    np.testing.assert_allclose(np.asarray(both),
                               0.5 * (np.asarray(ll1) + np.asarray(ll2)),
                               rtol=1e-10)


def test_conv_recognize_shapes():
    key = jax.random.PRNGKey(0)
    params = recognition.init_conv_recognize(
        key, (8, 8), channels=(4, 8), kernel_size=3, d_latent=3,
        dtype=jnp.float64)
    data = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 64), jnp.float64)
    J, h = recognition.make_conv_recognize((8, 8))(params, data)
    assert J.shape == (2, 5, 3) and h.shape == (2, 5, 3)
    assert np.all(np.asarray(J) > 0)


def test_resnet_recognize_shapes_and_grad():
    key = jax.random.PRNGKey(0)
    params = recognition.init_resnet_recognize(key, 5, 16, 3, 2,
                                               dtype=jnp.float64)
    data = jax.random.normal(jax.random.PRNGKey(1), (3, 11, 5), jnp.float64)
    J, h = recognition.resnet_recognize(params, data)
    assert J.shape == (3, 11, 2) and h.shape == (3, 11, 2)
    assert np.all(np.asarray(J) > 0)

    # gradients reach every block through the identity skips
    def loss(p):
        Jd, hv = recognition.resnet_recognize(p, data)
        return jnp.sum(Jd) + jnp.sum(hv ** 2)

    g = jax.grad(loss)(params)
    assert all(float(jnp.max(jnp.abs(x))) > 0 for x in jax.tree.leaves(g))


def test_resnet_depth_zero_is_projected_head():
    key = jax.random.PRNGKey(0)
    stack = mlp.init_resnet(key, 4, 8, 0, dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 4), jnp.float64)
    out = mlp.resnet(stack, x)
    (Wp, bp), blocks = stack
    assert blocks == ()
    np.testing.assert_allclose(np.asarray(out),
                               np.tanh(np.asarray(x @ Wp + bp)))
