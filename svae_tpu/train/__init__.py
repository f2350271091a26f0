"""Training core (reference: svae/svae.py, svae/optimizers.py).

  * ``elbo``       - MC-ELBO assembly and the split gradient: closed-form
                     natural gradient for the conjugate PGM globals +
                     backprop gradients for recognition/decoder nets.
  * ``optim``      - natural-gradient SGD for the globals, optax wrappers
                     (adam by default) for the nets, fused update step.
  * ``loop``       - jitted training step + host-side loop with callbacks,
                     metrics, and checkpointing hooks.
  * ``checkpoint`` - save/restore of the full training state pytree.
  * ``metrics``    - JSONL/CSV metric writer and step timing.
"""

from svae_tpu.train import elbo, optim, loop, checkpoint, metrics, experiment

__all__ = ["elbo", "optim", "loop", "checkpoint", "metrics", "experiment"]
