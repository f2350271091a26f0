"""Optimizers: natural-gradient ascent for the conjugate PGM globals, optax
(adam by default) for the net params.

(reference: svae/optimizers.py -- adam / sga hand-rolled loops with a
per-iteration callback. Here the *update* is a pure function so it lives
inside the jitted training step; the loop and callback live in
svae_tpu/train/loop.py.)
"""

from typing import NamedTuple, Any

import jax
import jax.numpy as jnp
import optax

from svae_tpu.utils.pytree import tree_add, tree_scale


class SVAEOptState(NamedTuple):
    net_opt_state: Any
    step: jnp.ndarray


def get_net_optimizer(name, step_size=1e-3):
    """Named net-optimizer presets mirroring the reference's optimizer
    module (reference: svae/optimizers.py -- adam / sga / adadelta):
    "adam" (default), "sga" (plain gradient ascent), "adadelta".
    Returns an optax transform for :func:`make_optimizer`."""
    makers = {
        "adam": optax.adam,
        "sga": optax.sgd,
        "adadelta": lambda lr: optax.adadelta(learning_rate=lr),
    }
    if name not in makers:
        raise ValueError(
            f"unknown net optimizer {name!r}; one of {sorted(makers)}")
    return makers[name](step_size)


def make_optimizer(net_optimizer=None, pgm_step_size=1.0,
                   net_step_size=1e-3):
    """Returns ``(init, update)``:

      init(pgm_params, net_params) -> SVAEOptState
      update(state, pgm_params, net_params, pgm_natgrad, net_grads)
          -> (new_pgm_params, new_net_params, new_state)

    PGM globals: plain ascent along the natural gradient (SGA in natural
    coordinates is natural-gradient SVI, reference: svae/optimizers.py:sga).
    Nets: any optax transform, or a preset name resolved by
    :func:`get_net_optimizer`; grads are ASCENT directions so they are
    negated before the (descent-convention) optax update.
    """
    if net_optimizer is None:
        net_optimizer = optax.adam(net_step_size)
    elif isinstance(net_optimizer, str):
        net_optimizer = get_net_optimizer(net_optimizer, net_step_size)

    def init(pgm_params, net_params):
        return SVAEOptState(
            net_opt_state=net_optimizer.init(net_params),
            step=jnp.zeros((), jnp.int32),
        )

    def update(state, pgm_params, net_params, pgm_natgrad, net_grads):
        new_pgm = tree_add(pgm_params, tree_scale(pgm_natgrad, pgm_step_size))
        neg_grads = tree_scale(net_grads, -1.0)
        updates, net_opt_state = net_optimizer.update(
            neg_grads, state.net_opt_state, net_params
        )
        new_net = optax.apply_updates(net_params, updates)
        return new_pgm, new_net, SVAEOptState(net_opt_state, state.step + 1)

    return init, update
