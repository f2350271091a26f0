"""Distributed training (greenfield -- the reference is single-process CPU;
SURVEY.md section 5 "Distributed comm backend").

JAX-native SPMD: an explicit device mesh + ``shard_map`` with the
collectives placed by hand where the SVI math needs them --

  * ``data`` axis: minibatch sharding; ``psum`` of (a) the expected
    sufficient statistics feeding the conjugate natural gradient and
    (b) the recognition/decoder backprop gradients,
  * ``mc`` axis: Monte-Carlo reparameterization particles sharded across
    chips; decoder log-likelihood (and its gradients) ``pmean``-ed.

XLA lowers the collectives onto ICI within a slice / DCN across slices;
there is no custom transport layer to write. ``multihost.initialize`` wraps
``jax.distributed`` for pod runs.
"""

from svae_tpu.parallel.mesh import make_mesh, local_batch_size
from svae_tpu.parallel.dp import make_dp_train_step

__all__ = ["make_mesh", "local_batch_size", "make_dp_train_step"]
