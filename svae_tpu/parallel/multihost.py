"""Multi-host initialization and cross-host consistency checks.

``initialize`` wraps ``jax.distributed.initialize`` (no-op when
single-process). ``param_fingerprint`` gives a cheap scalar hash of a param
pytree; asserting it is identical across hosts catches replicated-state
divergence early (the SPMD analogue of a race detector -- SURVEY.md
section 5 "Race detection").
"""

import jax
import jax.numpy as jnp

from svae_tpu.utils.pytree import flat


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize the JAX distributed runtime for a multi-host pod slice.

    All arguments default to auto-detection from the TPU environment; pass
    them explicitly for CPU/GPU clusters. Safe to call when already
    initialized (returns False then).
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except RuntimeError:  # already initialized
        return False


def param_fingerprint(params):
    """Deterministic scalar fingerprint of a parameter pytree (device
    computation; compare across hosts via an all_gather or host-side
    exchange)."""
    v = flat(params).astype(jnp.float32)
    # two decorrelated reductions make collisions across divergent replicas
    # vanishingly unlikely
    i = jnp.arange(v.shape[0], dtype=jnp.float32)
    return jnp.stack([jnp.sum(v * jnp.cos(0.1 * i)), jnp.sum(jnp.abs(v))])


def assert_replicated_consistent(params, mesh, axis="data", atol=0.0):
    """Inside-or-outside jit check that every shard holds identical params:
    all_gathers the fingerprint over ``axis`` and compares."""
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map as _shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map as _shard_map

    def check(p):
        fp = param_fingerprint(p)
        fps = jax.lax.all_gather(fp, axis)
        return jnp.max(jnp.abs(fps - fps[0]))

    diff = jax.jit(
        _shard_map(check, mesh=mesh, in_specs=(P(),), out_specs=P(),
                   check_vma=False)
    )(params)
    if float(diff) > atol:
        raise AssertionError(
            f"replicated params diverged across '{axis}' shards: "
            f"max fingerprint diff {float(diff)}"
        )
    return float(diff)
