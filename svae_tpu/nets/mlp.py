"""Minimal pure-JAX MLP with Gaussian output heads.

(reference: svae/nnet.py -- init_layer/init_mlp/mlp with tanh layers and
gaussian_mean / gaussian_info output heads.)

Parameters are tuples of (W, b) pairs; the output head owns two linear maps
(one per Gaussian output block). Everything is batched over arbitrary
leading axes of the input's last dimension.
"""

import jax
import jax.numpy as jnp


def matmul(x, W, compute_dtype=None):
    """``x @ W`` with an optional reduced-precision MXU operand path.

    ``compute_dtype=jnp.bfloat16`` casts ONLY the matmul operands to bf16
    and accumulates in float32 (``preferred_element_type``) -- the TPU MXU
    runs bf16xbf16->f32 at 2x the f32 rate, so this is a pure-throughput
    knob for the (dense) net compute. Params, biases, activations and all
    PGM-side algebra stay float32 (the small-matrix PSD linalg must NOT
    take this path -- see utils/psd.py for why bf16 operand truncation is
    unsafe there). ``None`` is the exact float32 path.
    """
    if compute_dtype is None:
        return x @ W
    return jnp.matmul(
        x.astype(compute_dtype),
        W.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )


def _glorot(key, n_in, n_out, scale=1.0, dtype=jnp.float32):
    std = scale * jnp.sqrt(2.0 / (n_in + n_out))
    return std * jax.random.normal(key, (n_in, n_out), dtype)


def init_layer(key, n_in, n_out, scale=1.0, dtype=jnp.float32):
    """One dense layer's parameters (W, b)."""
    return (_glorot(key, n_in, n_out, scale, dtype), jnp.zeros((n_out,), dtype))


def init_mlp(key, sizes, scale=1.0, dtype=jnp.float32):
    """Hidden stack params for sizes = (d_in, h1, ..., hk). Returns a tuple of
    (W, b) pairs; apply with :func:`mlp` (tanh nonlinearity, as the
    reference's default)."""
    keys = jax.random.split(key, len(sizes) - 1)
    return tuple(
        init_layer(k, m, n, scale, dtype)
        for k, m, n in zip(keys, sizes[:-1], sizes[1:])
    )


def mlp(params, x, activation=jnp.tanh, compute_dtype=None):
    """Apply the hidden stack; activation after every layer.
    ``compute_dtype`` selects the reduced-precision matmul path
    (see :func:`matmul`)."""
    for W, b in params:
        x = activation(matmul(x, W, compute_dtype) + b)
    return x


def init_resnet(key, d_in, width, depth, scale=1.0, dtype=jnp.float32):
    """Residual hidden stack: an input projection to ``width`` followed by
    ``depth`` two-layer residual blocks (reference: the resnet_recognize
    variant of svae/recognition_models.py). Returns
    ``(proj, ((W1,b1),(W2,b2)) * depth)``; apply with :func:`resnet`."""
    keys = jax.random.split(key, 2 * depth + 1)
    proj = init_layer(keys[0], d_in, width, scale, dtype)
    blocks = tuple(
        (init_layer(keys[2 * i + 1], width, width, scale, dtype),
         init_layer(keys[2 * i + 2], width, width, scale, dtype))
        for i in range(depth)
    )
    return (proj, blocks)


def resnet(params, x, activation=jnp.tanh, compute_dtype=None):
    """Apply the residual stack: h = act(proj(x));
    h <- h + act(W2 act(W1 h + b1) + b2) per block. Identity skips keep
    gradients well-conditioned at depth (matches the reference's residual
    recognition variant; the output feeds a Gaussian head)."""
    (Wp, bp), blocks = params
    h = activation(matmul(x, Wp, compute_dtype) + bp)
    for (W1, b1), (W2, b2) in blocks:
        inner = activation(matmul(h, W1, compute_dtype) + b1)
        h = h + activation(matmul(inner, W2, compute_dtype) + b2)
    return h


def init_gaussian_head(key, n_in, n_out, scale=1.0, dtype=jnp.float32):
    """Two parallel linear output maps (for the two Gaussian blocks)."""
    k1, k2 = jax.random.split(key)
    return (
        init_layer(k1, n_in, n_out, scale, dtype),
        init_layer(k2, n_in, n_out, scale, dtype),
    )


def gaussian_mean_head(head_params, h, mean_fn=None, compute_dtype=None):
    """Decoder head: h -> (mu, log_sigmasq). ``mean_fn`` (e.g. sigmoid for
    image data) post-processes the mean block."""
    (Wm, bm), (Ws, bs) = head_params
    mu = matmul(h, Wm, compute_dtype) + bm
    if mean_fn is not None:
        mu = mean_fn(mu)
    log_sigmasq = matmul(h, Ws, compute_dtype) + bs
    return mu, log_sigmasq


def gaussian_info_head(head_params, h, eps=1e-6, compute_dtype=None):
    """Recognition head: h -> diagonal natural potential (J_diag, h_lin) with
    J_diag > 0 via softplus (reference's gaussian_info emits (J, h) evidence
    potentials)."""
    (Wj, bj), (Wh, bh) = head_params
    J_diag = jax.nn.softplus(matmul(h, Wj, compute_dtype) + bj) + eps
    h_lin = matmul(h, Wh, compute_dtype) + bh
    return J_diag, h_lin


def init_gaussian_mlp(key, sizes, scale=1.0, dtype=jnp.float32):
    """Full net params: (hidden stack, gaussian head). ``sizes`` =
    (d_in, h1, ..., hk, d_out); with no hidden layers this is a linear map."""
    k1, k2 = jax.random.split(key)
    hidden = init_mlp(k1, sizes[:-1], scale, dtype)
    head = init_gaussian_head(k2, sizes[-2], sizes[-1], scale, dtype)
    return (hidden, head)


def rand_partial_isometry(key, m, n, dtype=jnp.float32):
    """Random partial isometry (orthonormal rows/cols of a QR factor) --
    the reference's norm-preserving init for decoder output maps
    (reference: svae/util.py:rand_partial_isometry)."""
    d = max(m, n)
    Q, _ = jnp.linalg.qr(jax.random.normal(key, (d, d), dtype))
    return Q[:m, :n]


def init_gaussian_mlp_isometric(key, sizes, scale=1.0, sigma_init=-2.0,
                                dtype=jnp.float32):
    """Like :func:`init_gaussian_mlp` but the mean output map is a random
    partial isometry and the log-variance head starts at ``sigma_init``
    (small observation noise) -- the reference's decoder init, which keeps
    early reconstructions in the data's scale instead of collapsed at 0."""
    k1, k2 = jax.random.split(key)
    hidden = init_mlp(k1, sizes[:-1], scale, dtype)
    n_in, n_out = sizes[-2], sizes[-1]
    Wm = rand_partial_isometry(k2, n_in, n_out, dtype)
    mean_layer = (Wm, jnp.zeros((n_out,), dtype))
    sig_layer = (jnp.zeros((n_in, n_out), dtype),
                 sigma_init * jnp.ones((n_out,), dtype))
    return (hidden, (mean_layer, sig_layer))
