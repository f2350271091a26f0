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


def mlp_recognize(params, data, compute_dtype=None):
    """data (..., d_obs) -> (J_diag, h) each (..., d_latent).
    ``compute_dtype=jnp.bfloat16`` selects the MXU reduced-precision matmul
    path (f32 accumulation; see nets.mlp.matmul)."""
    hidden, head = params
    h = mlp_lib.mlp(hidden, data, compute_dtype=compute_dtype)
    return mlp_lib.gaussian_info_head(head, h, compute_dtype=compute_dtype)


def init_resnet_recognize(key, d_obs, width, depth, d_latent,
                          dtype=jnp.float32):
    """Residual-MLP recognizer (reference: the resnet variant of
    svae/recognition_models.py): identity-skip blocks keep the evidence
    map well-conditioned at depth."""
    k1, k2 = jax.random.split(key)
    stack = mlp_lib.init_resnet(k1, d_obs, width, depth, dtype=dtype)
    head = mlp_lib.init_gaussian_head(k2, width, d_latent, dtype=dtype)
    return (stack, head)


def resnet_recognize(params, data, compute_dtype=None):
    """data (..., d_obs) -> (J_diag, h) each (..., d_latent)."""
    stack, head = params
    h = mlp_lib.resnet(stack, data, compute_dtype=compute_dtype)
    return mlp_lib.gaussian_info_head(head, h, compute_dtype=compute_dtype)


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
    (the temporal structure lives in the PGM, not the recognizer). The
    frame shape is STATIC: apply with ``make_conv_recognize(frame_shape)``
    (or pass it to :func:`conv_recognize`), it is not part of the param
    pytree (grad-able leaves only).
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
    return (tuple(convs), head)


def _conv2d_im2col(x, Wk, stride=2, compute_dtype=None):
    """SAME-padded strided conv as phase-decomposed im2col.

    Why not ``lax.conv`` (or even plain strided slices): XLA:TPU's fusion
    emitter crashes ("TransformWindow: Loop will not make progress",
    fusion_util.cc) on the backward of strided window ops at small spatial
    shapes -- and it pattern-matches strided slices back into windows. So
    the conv is built exclusively from window-free ops: pad -> reshape the
    spatial axes into (position, stride-phase) -> k*k STRIDE-1 slices of
    the phase planes -> concat -> one MXU matmul. The tap at output o,
    kernel offset d lives at padded index s*o + d = s*(o + d//s) + d%s,
    i.e. phase d%s, position o + d//s: a contiguous slice.

    x: (N, H, W, C), Wk: (k, k, C, C_out).
    """
    N, H, W, C = x.shape
    k = Wk.shape[0]
    s = stride
    Ho = -(-H // s)
    Wo = -(-W // s)
    qmax = (k - 1) // s
    pad_h_low = max(((Ho - 1) * s + k - H) // 2, 0)
    pad_w_low = max(((Wo - 1) * s + k - W) // 2, 0)
    Hp = s * (Ho + qmax)
    Wp = s * (Wo + qmax)
    xp = jnp.pad(x, ((0, 0), (pad_h_low, Hp - H - pad_h_low),
                     (pad_w_low, Wp - W - pad_w_low), (0, 0)))
    ph = xp.reshape(N, Hp // s, s, Wp // s, s, C)
    cols = []
    for di in range(k):
        qi, ri = di // s, di % s
        for dj in range(k):
            qj, rj = dj // s, dj % s
            cols.append(ph[:, qi:qi + Ho, ri, qj:qj + Wo, rj, :])
    patches = jnp.concatenate(cols, axis=-1)  # (N, Ho, Wo, k*k*C)
    Wmat = Wk.reshape(k * k * C, -1)
    return mlp_lib.matmul(patches, Wmat, compute_dtype)


def conv_recognize(params, data, frame_shape, compute_dtype=None):
    """data (..., H*W*C) or (..., H, W, C) -> (J_diag, h) on (..., d_latent).

    Stride-2 tanh convs (im2col formulation, see :func:`_conv2d_im2col`);
    all leading axes (batch, time) are flattened into a single batch dim,
    so the MXU sees one large batched matmul instead of a scan over frames.
    ``compute_dtype=jnp.bfloat16`` runs the im2col matmuls and the head with
    bf16 MXU operands + f32 accumulation (2x matmul throughput; the conv
    stack dominates the conv_lds step, so this is the step's main knob).
    """
    if len(frame_shape) == 2:
        frame_shape = tuple(frame_shape) + (1,)
    H, W, C = frame_shape
    convs, head = params
    lead = data.shape[: data.ndim - 1] if data.ndim >= 1 else ()
    x = data.reshape((-1, H, W, C))
    for Wk, b in convs:
        x = jnp.tanh(_conv2d_im2col(x, Wk, compute_dtype=compute_dtype) + b)
    x = x.reshape((x.shape[0], -1))
    J_diag, h = mlp_lib.gaussian_info_head(head, x, compute_dtype=compute_dtype)
    d_latent = h.shape[-1]
    return (
        J_diag.reshape(lead + (d_latent,)),
        h.reshape(lead + (d_latent,)),
    )


def make_conv_recognize(frame_shape, compute_dtype=None):
    """Close over the static frame shape (and optional reduced-precision
    compute dtype) -> ``recognize(params, data)`` usable directly as the
    training core's recognize function."""

    def recognize(params, data):
        return conv_recognize(params, data, frame_shape,
                              compute_dtype=compute_dtype)

    return recognize
