"""Recognition networks: data -> conjugate evidence potentials.

(reference: svae/recognition_models.py -- linear_recognize / mlp_recognize.)

A recognition function maps observations with arbitrary leading batch/time
axes to diagonal Gaussian natural potentials ``(J_diag, h)`` on the latents
(J_diag > 0 is the diagonal of the evidence precision). Models lift these to
dense natural parameters with ``expfam.gaussian.pack_dense`` and combine
them with PGM potentials by addition in natural coordinates.
"""

import jax
import jax.numpy as jnp

from svae_tpu.nets import mlp as mlp_lib


def init_mlp_recognize(key, d_obs, hidden_sizes, d_latent, dtype=jnp.float32):
    return mlp_lib.init_gaussian_mlp(
        key, (d_obs,) + tuple(hidden_sizes) + (d_latent,), dtype=dtype
    )


def mlp_recognize(params, data):
    """data (..., d_obs) -> (J_diag, h) each (..., d_latent)."""
    hidden, head = params
    h = mlp_lib.mlp(hidden, data)
    return mlp_lib.gaussian_info_head(head, h)


def init_linear_recognize(key, d_obs, d_latent, dtype=jnp.float32):
    return mlp_lib.init_gaussian_mlp(key, (d_obs, d_latent), dtype=dtype)


def linear_recognize(params, data):
    _, head = params
    return mlp_lib.gaussian_info_head(head, data)


def init_conv_recognize(
    key, frame_shape, channels, kernel_size, d_latent, dtype=jnp.float32
):
    """Per-frame conv feature stack + gaussian-info head, for image-sequence
    LDS models (BASELINE config 4: conv recognition net, T=500).

    ``frame_shape`` = (H, W) or (H, W, C); frames are treated independently
    (the temporal structure lives in the PGM, not the recognizer).
    """
    if len(frame_shape) == 2:
        frame_shape = tuple(frame_shape) + (1,)
    H, W, C = frame_shape
    keys = jax.random.split(key, len(channels) + 1)
    convs = []
    c_in = C
    for k, c_out in zip(keys[:-1], channels):
        fan_in = kernel_size * kernel_size * c_in
        fan_out = kernel_size * kernel_size * c_out
        std = jnp.sqrt(2.0 / (fan_in + fan_out))
        Wk = std * jax.random.normal(
            k, (kernel_size, kernel_size, c_in, c_out), dtype
        )
        convs.append((Wk, jnp.zeros((c_out,), dtype)))
        c_in = c_out
    # stride-2 convs halve each spatial dim per layer
    h_out, w_out = H, W
    for _ in channels:
        h_out, w_out = (h_out + 1) // 2, (w_out + 1) // 2
    feat = h_out * w_out * c_in
    head = mlp_lib.init_gaussian_head(keys[-1], feat, d_latent, dtype=dtype)
    return (tuple(convs), head, (H, W, C))


def conv_recognize(params, data):
    """data (..., H*W*C) or (..., H, W, C) -> (J_diag, h) on (..., d_latent).

    Stride-2 tanh convs; all leading axes (batch, time) are flattened into a
    single batch dim for the conv, then restored -- the MXU sees one large
    batched conv instead of a scan over frames.
    """
    convs, head, (H, W, C) = params
    lead = data.shape[: data.ndim - 1] if data.ndim >= 1 else ()
    x = data.reshape((-1, H, W, C))
    for Wk, b in convs:
        x = jax.lax.conv_general_dilated(
            x, Wk, window_strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = jnp.tanh(x + b)
    x = x.reshape((x.shape[0], -1))
    J_diag, h = mlp_lib.gaussian_info_head(head, x)
    d_latent = h.shape[-1]
    return (
        J_diag.reshape(lead + (d_latent,)),
        h.reshape(lead + (d_latent,)),
    )
