"""Multi-host initialization and cross-host consistency checks.

``initialize`` wraps ``jax.distributed.initialize`` (no-op when
single-process). ``param_fingerprint`` gives a cheap scalar hash of a param
pytree; asserting it is identical across hosts catches replicated-state
divergence early (the SPMD analogue of a race detector -- SURVEY.md
section 5 "Race detection").

Failure model (SURVEY.md section 5 "Failure detection"): a host that dies
or is preempted surfaces as a coordination-service barrier timeout in every
surviving process -- ``initialize`` bounds that wait and re-raises with an
actionable message instead of hanging forever. Recovery is
checkpoint-restart on the SAME fixed mesh (svae_tpu/train/checkpoint.py +
experiment.run's RNG-stream resume); **elastic resize is an explicit
non-goal**: the natural-gradient scaling (N / global_batch) and the mesh
axes are baked into the compiled step, so a changed process count means a
fresh ``initialize`` + resume from the latest checkpoint, not an in-flight
reshape. (docs/DESIGN.md "failure detection".)
"""

import jax
import jax.numpy as jnp

from svae_tpu.utils.pytree import flat


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               timeout_secs=300):
    """Initialize the JAX distributed runtime for a multi-host pod slice.

    All arguments default to auto-detection from the TPU environment; pass
    them explicitly for CPU/GPU clusters. Safe to call when already
    initialized (returns False then).

    ``timeout_secs`` bounds the startup barrier: if the full set of
    processes does not connect in time (lost host, mis-scheduled job), the
    coordination-service timeout is surfaced as a RuntimeError naming the
    likely cause rather than an indefinite hang.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            initialization_timeout=timeout_secs,
        )
        return True
    except RuntimeError as e:
        # JaxRuntimeError subclasses RuntimeError, so both the re-init and
        # the coordination-service failure land here.
        msg = str(e).lower()
        # jax raises 'distributed.initialize should only be called once.'
        # on re-init (jax/_src/distributed.py); older versions said
        # 'already initialized'.
        if "only be called once" in msg or "already initialized" in msg:
            return False
        if "deadline_exceeded" in msg or "timed out" in msg:
            raise RuntimeError(
                f"jax.distributed.initialize barrier timed out after "
                f"{timeout_secs}s: not all {num_processes or 'expected'} "
                "processes reached the coordinator (a host is down, "
                "preempted, or mis-addressed). This mesh is fixed-size "
                "(no elastic resize): restart the full job and resume "
                "from the latest checkpoint."
            ) from e
        raise


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
