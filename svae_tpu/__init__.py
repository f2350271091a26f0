"""svae_tpu: a TPU-native framework for structured variational autoencoders.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
``mattjj/svae`` (Johnson et al. 2016, "Composing graphical models with neural
networks for structured representations and fast inference",
arXiv:1603.06277): conjugate exponential-family graphical-model priors (GMM,
LDS, SLDS) composed with neural recognition networks and decoders, trained by
natural-gradient stochastic variational inference.

Architecture (TPU-first, not a port):
  * ``expfam``   - exponential-family distribution library; the contract is
                   ``expectedstats(eta) == jax.grad(logZ)(eta)``.
                   (reference: svae/distributions/*.py)
  * ``ops``      - message-passing inference kernels: Kalman filter/smoother/
                   sampler and HMM forward-backward, each with a sequential
                   lax.scan flavor (default; see the scan-flavor policy in
                   ops/kalman.py) and an O(log T)-span associative-scan
                   flavor (Sarkka & Garcia-Fernandez, arXiv:1905.13002 /
                   arXiv:2102.05743), plus float64 sequential NumPy oracles
                   standing in for the reference's autograd/Cython
                   implementations.
                   (reference: svae/lds/lds_inference.py,
                    svae/lds/cython_lds_inference.pyx, svae/hmm/*)
  * ``models``   - GMM / LDS / SLDS SVAE models exposing the reference's
                   ``run_inference(prior, global, node_potentials, key,
                   num_samples) -> (samples, stats, global_kl, local_kl)``
                   contract. (reference: svae/models/*.py)
  * ``nets``     - recognition networks and decoders (pure-JAX pytree params).
                   (reference: svae/nnet.py, svae/recognition_models.py,
                    svae/forward_models.py)
  * ``train``    - MC-ELBO assembly, closed-form natural gradients for the
                   conjugate globals, optimizers, training loop, checkpointing.
                   (reference: svae/svae.py, svae/optimizers.py)
  * ``parallel`` - device-mesh setup and data-parallel / MC-particle-sharded
                   training steps via ``jax.sharding`` + ``shard_map``
                   (greenfield; the reference is single-process CPU).
  * ``utils``    - pytree and PSD-matrix helpers. (reference: svae/util.py)
"""

__version__ = "0.1.0"

from svae_tpu import expfam, ops, models, nets, train, parallel, data, utils
from svae_tpu import config

__all__ = [
    "expfam", "ops", "models", "nets", "train", "parallel", "data",
    "utils", "config",
]
