"""Neural recognition networks and decoders (reference: svae/nnet.py,
svae/recognition_models.py, svae/forward_models.py).

Pure-JAX pytree parameters (no framework dependency in the hot path): a
parameter set is a nested tuple of arrays, so it composes with ``jit``,
``vmap``, ``grad`` and the optimizer/pytree algebra exactly like the
natural-parameter structures do.

  * ``mlp``  - layer/MLP init and application, Gaussian output heads:
               ``gaussian_info`` (recognition: diagonal natural potentials
               (J, h)) and ``gaussian_mean`` (decoder: (mu, log sigma^2)).
  * ``recognition`` - data -> conjugate evidence potentials.
  * ``decoders``    - latent samples -> decoder log-likelihood of data.
"""

from svae_tpu.nets import mlp, recognition, decoders

__all__ = ["mlp", "recognition", "decoders"]
