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


def test_bf16_compute_path_matches_f32_within_tolerance():
    """compute_dtype=bfloat16 truncates only matmul operands (f32
    accumulation), so outputs must track the f32 path at bf16 operand
    tolerance and params/outputs stay f32-typed."""
    key = jax.random.PRNGKey(0)
    params = recognition.init_mlp_recognize(key, 12, (32, 32), 5,
                                            dtype=jnp.float32)
    data = jax.random.normal(jax.random.PRNGKey(1), (9, 12), jnp.float32)
    J32, h32 = recognition.mlp_recognize(params, data)
    Jbf, hbf = recognition.mlp_recognize(params, data,
                                         compute_dtype=jnp.bfloat16)
    assert Jbf.dtype == jnp.float32 and hbf.dtype == jnp.float32
    assert np.all(np.asarray(Jbf) > 0)
    np.testing.assert_allclose(np.asarray(Jbf), np.asarray(J32),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(hbf), np.asarray(h32),
                               rtol=0.05, atol=0.05)


def test_bf16_loglike_grads_are_f32_and_close():
    key = jax.random.PRNGKey(2)
    params = decoders.init_mlp_decode(key, 3, (16,), 6, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 3), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(4), (4, 6), jnp.float32)
    ll_bf = decoders.make_mlp_loglike(compute_dtype=jnp.bfloat16)

    g32 = jax.grad(lambda p: decoders.mlp_loglike(p, x, y))(params)
    gbf = jax.grad(lambda p: ll_bf(p, x, y))(params)
    for a, b in zip(jax.tree.leaves(g32), jax.tree.leaves(gbf)):
        assert b.dtype == jnp.float32
        assert np.all(np.isfinite(np.asarray(b)))
        # direction agreement at bf16 operand truncation tolerance
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na > 1e-6:
            cos = float(np.sum(np.asarray(a) * np.asarray(b)) / (na * nb))
            assert cos > 0.99


def test_bf16_conv_recognize_close_to_f32():
    key = jax.random.PRNGKey(5)
    hw = (8, 8)
    params = recognition.init_conv_recognize(key, hw, (4, 8), 3, 5,
                                             dtype=jnp.float32)
    data = jax.random.normal(jax.random.PRNGKey(6), (2, 7, 64), jnp.float32)
    J32, h32 = recognition.conv_recognize(params, data, hw)
    Jbf, hbf = recognition.conv_recognize(params, data, hw,
                                          compute_dtype=jnp.bfloat16)
    assert Jbf.shape == J32.shape == (2, 7, 5)
    np.testing.assert_allclose(np.asarray(hbf), np.asarray(h32),
                               rtol=0.1, atol=0.1)
    np.testing.assert_allclose(np.asarray(Jbf), np.asarray(J32),
                               rtol=0.1, atol=0.1)
