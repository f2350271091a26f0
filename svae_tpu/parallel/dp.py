"""Data-parallel + MC-particle-sharded SVI training step via ``shard_map``.

Collective placement (SURVEY.md section 2 "Parallelism census"):

  * expected sufficient statistics -> ``psum`` over the ``data`` axis
    before the conjugate natural-gradient assembly (the scaling identity
    ``natgrad = scale/N * (prior + (N/B_global) * stats_total - params)``
    is applied to the *globally summed* stats -- hard part 6),
  * net gradients / ELBO -> ``pmean`` over ``mc`` then ``psum`` over
    ``data`` (each data shard contributes a term; mc shards hold
    independent reparameterization particles of the same term),
  * the parameter/optimizer update then runs replicated and deterministic
    on every shard (all inputs are post-collective).

Per-shard RNG: the step key is folded with the shard's (data, mc)
coordinates, so every device draws independent particles and the result is
independent of how the mesh is laid out across hosts.
"""


import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

try:  # jax >= 0.4.35 exposes shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from svae_tpu.train import elbo as elbo_lib
from svae_tpu.train.optim import make_optimizer
from svae_tpu.utils.pytree import tree_add, tree_scale, tree_sub


def shard_key(key, data_axis="data", mc_axis="mc"):
    """Per-shard PRNG key from a replicated key + mesh coordinates."""
    key = jax.random.fold_in(key, jax.lax.axis_index(data_axis))
    return jax.random.fold_in(key, jax.lax.axis_index(mc_axis) + 7919)


def make_dp_train_step(run_inference, recognize, loglike, pgm_prior, N,
                       mesh, global_batch, num_samples=1, natgrad_scale=1.0,
                       pgm_step_size=1.0, net_optimizer=None,
                       net_step_size=1e-3, donate=True, mask_fn=None,
                       ragged=False):
    """Build ``(init_state, train_step)`` like train.loop.make_train_step,
    but SPMD over ``mesh`` (axes ``('mc', 'data')``). ``mask_fn`` enables
    missing-data training exactly as in train.elbo.make_objective (applied
    per data shard -- masking is elementwise, so it commutes with the
    batch sharding); ``ragged`` makes the batch a ``(frames, lengths)``
    pair from the length-bucketed loader, both sharded over ``data``
    (lengths are per-sequence, so they ride the same axis).

    ``train_step(pgm_params, net_params, opt_state, batch, key)`` takes the
    GLOBAL batch (leading axis ``global_batch``, sharded over ``data``) and
    a replicated key; ``num_samples`` is the per-shard particle count, so
    the effective MC sample size is ``num_samples * mesh.shape['mc']``.
    Returns ``(pgm_params, net_params, opt_state, elbo, terms)`` -- the
    SAME contract as ``train.loop.make_train_step`` (replicated updated
    params/state, global ELBO/datapoint, and the metrics dict with the
    three ELBO components + net-grad norm), so the loop/experiment layer
    and callbacks work unchanged on the DP step.
    """
    opt_init, opt_update = make_optimizer(net_optimizer, pgm_step_size,
                                          net_step_size)
    D = mesh.shape["data"]

    def step_shard(pgm_params, net_params, opt_state, batch, key):
        k = shard_key(key)

        # Per-shard objective. Scaling pitfall (hard part 6): the data
        # terms get N/B_GLOBAL (each shard sees B_global/D points and the
        # shards are psum-med), and the replicated global-KL is spread
        # across the D data shards so the psum counts it exactly once.
        def shard_objective(net_params):
            scale = N / global_batch
            ll, stats, global_kl, local_kl, _ = elbo_lib.masked_forward(
                run_inference, recognize, loglike, pgm_prior, pgm_params,
                net_params, batch, k, num_samples, mask_fn, ragged)
            obj = (scale * (ll - local_kl) - global_kl / D) / N
            # per-shard metric terms (same normalization as
            # train.elbo.make_objective: per-datapoint over the GLOBAL
            # batch; summed across data shards by the psum below)
            terms = {
                "loglike": ll / global_batch,
                "local_kl": local_kl / global_batch,
                "global_kl": global_kl / (N * D),
            }
            return obj, (jax.lax.stop_gradient(stats),
                         jax.lax.stop_gradient(terms))

        (elbo_local, (stats, terms)), gnet = jax.value_and_grad(
            shard_objective, has_aux=True
        )(net_params)

        # collectives: particles average, data shards sum
        elbo = jax.lax.psum(jax.lax.pmean(elbo_local, "mc"), "data")
        gnet = jax.lax.psum(jax.lax.pmean(gnet, "mc"), "data")
        stats = jax.lax.psum(jax.lax.pmean(stats, "mc"), "data")
        terms = jax.lax.psum(jax.lax.pmean(terms, "mc"), "data")

        natgrad = tree_scale(
            tree_sub(
                tree_add(pgm_prior, tree_scale(stats, N / global_batch)),
                pgm_params,
            ),
            natgrad_scale / N,
        )
        new_pgm, new_net, new_opt = opt_update(opt_state, pgm_params,
                                               net_params, natgrad, gnet)
        terms = dict(terms)
        terms["net_grad_norm"] = jnp.sqrt(
            sum(jnp.sum(g * g) for g in jax.tree.leaves(gnet))
        )
        return new_pgm, new_net, new_opt, elbo, terms

    sharded = _shard_map(
        step_shard,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("data"), P()),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )
    donate_argnums = (0, 1, 2) if donate else ()
    return opt_init, jax.jit(sharded, donate_argnums=donate_argnums)
