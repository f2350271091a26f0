"""MC-ELBO assembly and the split SVAE gradient.

(reference: svae/svae.py -- make_gradfun / inner mc_elbo / gradfun. The
natgrad line being replicated, reference: svae/svae.py:make_gradfun:
``pgm_natgrad = -natgrad_scale/N * (flat(prior) + num_batches*flat(stats)
- flat(pgm_params))``.)

The SVAE objective for a minibatch of B of N datapoints:

  ELBO = (N/B) * [ E_q log p(y | x, gamma) - local_KL ] - global_KL

Two gradient channels (SURVEY.md section 3.4):
  1. the conjugate PGM globals get the *closed-form natural gradient*
     assembled from detached expected sufficient statistics:
         natgrad = (1/N) * (prior + (N/B) * stats - pgm_params)
     (ascent direction; the 1/N matches the reference's per-datapoint
     scaling so step sizes transfer),
  2. recognition/decoder net params get ordinary backprop gradients of the
     ELBO through the reparameterized samples and the local KL.
"""


import jax
import jax.numpy as jnp

from svae_tpu.utils.pytree import tree_add, tree_sub, tree_scale


def masked_forward(run_inference, recognize, loglike, pgm_prior,
                   pgm_params, net_params, batch, key, num_samples,
                   mask_fn=None, ragged=False):
    """Shared recognition -> inference -> decoder-loglike forward with the
    mask/lengths plumbing (used by the single-device objective here and
    the shard_map DP step in parallel/dp.py). Returns
    ``(ll, stats, global_kl, local_kl, B)``.

    Mask sources compose multiplicatively: ``mask_fn`` marks missing
    frames inside real data; ``ragged`` batches are ``(frames, lengths)``
    pairs whose lengths flow to ``run_inference(lengths=)`` (exact
    padded-batch semantics) and whose pad frames also drop out of the
    decoder term.
    """
    recogn_params, loglike_params = net_params
    if ragged:
        frames, lengths = batch
    else:
        frames, lengths = batch, None
    B = frames.shape[0]
    if mask_fn is None:
        clean, mask = frames, None
    else:
        clean, mask = mask_fn(frames)
    nn_potentials = recognize(recogn_params, clean)
    kw = {}
    if mask is not None:
        kw["mask"] = mask
    if lengths is not None:
        kw["lengths"] = lengths
    samples, stats, global_kl, local_kl = run_inference(
        pgm_prior, pgm_params, nn_potentials, key, num_samples, **kw
    )
    ll_mask = mask
    if lengths is not None:
        from svae_tpu.models.lds import _length_mask  # single convention
        lm = _length_mask(lengths, clean.shape[0], clean.shape[-2],
                          clean.dtype)
        ll_mask = lm if ll_mask is None else ll_mask * lm
    if ll_mask is None:
        ll = loglike(loglike_params, samples, clean)
    else:
        ll = loglike(loglike_params, samples, clean, mask=ll_mask)
    return ll, stats, global_kl, local_kl, B


def make_objective(run_inference, recognize, loglike, pgm_prior, N,
                   num_samples=1, mask_fn=None, ragged=False):
    """Build ``objective(pgm_params, net_params, batch, key) ->
    (elbo_per_datapoint, stats)`` where ``net_params = (recogn_params,
    loglike_params)`` and ``stats`` are the (detached) expected sufficient
    statistics for the natural gradient.

    ``mask_fn`` (optional): ``batch -> (clean_batch, mask)`` for data with
    missing frames (e.g. svae_tpu.data.masking.nan_mask). The recognition
    net sees ``clean_batch``; ``mask`` is forwarded to ``run_inference``
    (as ``mask=``) and to ``loglike`` (as ``mask=``), so missing frames
    contribute no evidence and no reconstruction term.

    ``ragged``: the batch is a ``(frames (B, T, d_obs), lengths (B,))``
    pair from a length-bucketed loader (svae_tpu.data.loader); lengths are
    forwarded to ``run_inference(lengths=)`` for exact padded-batch
    semantics and pad frames are dropped from the decoder term. Composes
    with ``mask_fn`` (missing frames inside the real region).
    """

    def objective(pgm_params, net_params, batch, key):
        ll, stats, global_kl, local_kl, B = masked_forward(
            run_inference, recognize, loglike, pgm_prior, pgm_params,
            net_params, batch, key, num_samples, mask_fn, ragged)
        scale = N / B
        elbo = scale * (ll - local_kl) - global_kl
        terms = {
            "loglike": ll / B,
            "local_kl": local_kl / B,
            "global_kl": global_kl / N,
        }
        return elbo / N, (jax.lax.stop_gradient(stats),
                          jax.lax.stop_gradient(terms))

    return objective


def make_gradfun(run_inference, recognize, loglike, pgm_prior, N,
                 num_samples=1, natgrad_scale=1.0, mask_fn=None,
                 ragged=False):
    """Build the per-step value-and-gradient function.

    ``gradfun(pgm_params, net_params, batch, key) ->
        (elbo_per_datapoint, pgm_natgrad, net_grads, terms)``

    ``pgm_natgrad`` is an ASCENT direction congruent with ``pgm_params``;
    ``net_grads`` are ascent gradients for (recogn_params, loglike_params);
    ``terms`` is a metrics dict with the ELBO's three components
    (per-datapoint) and the net-gradient global norm.
    Jit/pmap/shard_map-compatible (pure function of its inputs).
    """
    objective = make_objective(run_inference, recognize, loglike, pgm_prior,
                               N, num_samples, mask_fn=mask_fn,
                               ragged=ragged)

    def gradfun(pgm_params, net_params, batch, key):
        B = (batch[0] if ragged else batch).shape[0]

        def net_obj(net_params):
            return objective(pgm_params, net_params, batch, key)

        (elbo, (stats, terms)), net_grads = jax.value_and_grad(
            net_obj, has_aux=True
        )(net_params)
        # closed-form natural gradient from the conjugate stats
        # (reference: svae/svae.py:make_gradfun natgrad line)
        natgrad = tree_scale(
            tree_sub(tree_add(pgm_prior, tree_scale(stats, N / B)),
                     pgm_params),
            natgrad_scale / N,
        )
        terms = dict(terms)
        terms["net_grad_norm"] = jnp.sqrt(
            sum(jnp.sum(g * g) for g in jax.tree.leaves(net_grads))
        )
        return elbo, natgrad, net_grads, terms

    return gradfun
