"""Decoders (forward models): latent samples -> log-likelihood of data.

(reference: svae/forward_models.py -- mlp_decode / linear_decode and the
*_loglike wrappers that MC-average the diagonal-Gaussian observation
log-density over reparameterized samples.)
"""

import jax.numpy as jnp

from svae_tpu.nets import mlp as mlp_lib

# Python float, not jnp: a module-level jnp constant initializes the
# XLA backend at import, which breaks jax.distributed.initialize in
# multi-process programs (it must run before any backend touch).
LOG2PI = 1.8378770664093453


def init_mlp_decode(key, d_latent, hidden_sizes, d_obs, dtype=jnp.float32):
    return mlp_lib.init_gaussian_mlp(
        key, (d_latent,) + tuple(hidden_sizes) + (d_obs,), dtype=dtype
    )


def mlp_decode(params, x, mean_fn=None, compute_dtype=None):
    """x (..., d_latent) -> (mu, log_sigmasq) each (..., d_obs).
    ``compute_dtype=jnp.bfloat16`` selects the MXU reduced-precision matmul
    path (f32 accumulation; see nets.mlp.matmul)."""
    hidden, head = params
    h = mlp_lib.mlp(hidden, x, compute_dtype=compute_dtype)
    return mlp_lib.gaussian_mean_head(head, h, mean_fn=mean_fn,
                                      compute_dtype=compute_dtype)


def init_linear_decode(key, d_latent, d_obs, dtype=jnp.float32):
    return mlp_lib.init_gaussian_mlp(key, (d_latent, d_obs), dtype=dtype)


def linear_decode(params, x, mean_fn=None):
    _, head = params
    return mlp_lib.gaussian_mean_head(head, x, mean_fn=mean_fn)


def diag_gaussian_loglike(y, mu, log_sigmasq):
    """sum over obs dims of log N(y | mu, diag(exp(log_sigmasq))), retaining
    leading batch axes."""
    return -0.5 * jnp.sum(
        (y - mu) ** 2 / jnp.exp(log_sigmasq) + log_sigmasq + LOG2PI, axis=-1
    )


def mlp_loglike(params, samples, y, mean_fn=None, mask=None,
                compute_dtype=None):
    """MC-averaged decoder log-likelihood, summed over the batch.

    ``samples`` has shape (num_samples, ...batch..., d_latent) (or just
    (...batch..., d_latent)); ``y`` has shape (...batch..., d_obs). The
    sample axes broadcast against y and are averaged out; batch/time axes
    are summed (a total log-likelihood for the minibatch). ``mask``
    (broadcastable to y's batch axes, {0,1}/bool) drops missing frames
    from the sum (pair with run_inference's mask= / lengths=).
    ``compute_dtype=jnp.bfloat16`` runs the decoder matmuls with bf16 MXU
    operands (f32 accumulation); the log-density itself stays float32.
    """
    mu, log_sigmasq = mlp_decode(params, samples, mean_fn=mean_fn,
                                 compute_dtype=compute_dtype)
    ll = diag_gaussian_loglike(y, mu, log_sigmasq)
    extra = ll.ndim - (y.ndim - 1)
    if extra > 0:
        ll = jnp.mean(ll, axis=tuple(range(extra)))
    if mask is not None:
        ll = ll * jnp.asarray(mask, ll.dtype)
    return jnp.sum(ll)


def make_mlp_loglike(mean_fn=None, compute_dtype=None):
    """Close over decode options -> ``loglike(params, samples, y, mask=...)``
    usable directly as the training core's loglike function."""

    def loglike(params, samples, y, mask=None):
        return mlp_loglike(params, samples, y, mean_fn=mean_fn, mask=mask,
                           compute_dtype=compute_dtype)

    return loglike


def linear_loglike(params, samples, y, mean_fn=None, mask=None):
    mu, log_sigmasq = linear_decode(params, samples, mean_fn=mean_fn)
    ll = diag_gaussian_loglike(y, mu, log_sigmasq)
    extra = ll.ndim - (y.ndim - 1)
    if extra > 0:
        ll = jnp.mean(ll, axis=tuple(range(extra)))
    if mask is not None:
        ll = ll * jnp.asarray(mask, ll.dtype)
    return jnp.sum(ll)
