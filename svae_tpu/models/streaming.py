"""Serving-side streaming helpers shared by the online filters.

Greenfield subsystem (the reference -- svae/models/*.py -- is batch-only;
SURVEY.md section 5 has no serving row). Both ``lds.make_online_filter``
and ``slds.make_online_filter`` return the same ``(init_fn, step_fn)``
contract: one frame's diagonal recognition potentials in, filtered
posterior + incremental predictive log-evidence out. This module adds the
window/replay layer on top of that contract.

Why it exists: one-frame-per-dispatch serving is dispatch-latency-bound
through the host->TPU tunnel (~0.7-1.0 ms per jitted call at sub-10 us of
kernel work -- benchmarks/out/serving_latency.json). Batching W frames
into one jitted ``lax.scan`` amortizes that fixed cost over W frames:
same outputs, one dispatch. The scan is a compiler-friendly serialized
chain (static W, no data-dependent control flow), so XLA compiles it once
per window length.
"""

import jax
import jax.numpy as jnp


def make_window_filter(init_fn, step_fn):
    """Wrap an online filter into window-at-a-time dispatch.

    ``(init_fn, step_fn)`` is the contract returned by
    ``lds.make_online_filter`` / ``slds.make_online_filter``. Returns
    ``(window_init_fn, window_step_fn)`` consuming ``W`` frames per call:

      state, outs = window_init_fn((J_diag, h))     # (W, d) each: frames
                                                    # 1..W of the stream
      state, outs = window_step_fn(state, (J_diag, h))   # next W frames

    ``outs`` mirrors the per-frame outputs of the wrapped filter with a
    leading window axis W (e.g. means (W, d), covs (W, d, d), per-frame
    incremental log-evidence (W,)). The carried ``state`` is the wrapped
    filter's state at the window's last frame, so windows chain exactly:
    replaying a T-frame sequence in T/W windows produces bit-identical
    states and outputs to T single-frame ``step_fn`` calls (tested,
    tests/test_lds_model.py / tests/test_slds.py).

    ``jax.vmap`` both functions for a batch of independent streams, as
    with the single-frame filter. W is static per compilation; serve a
    few fixed window sizes (e.g. 16 and 64) and route by arrival burst.
    """

    def window_init_fn(potentials):
        first = jax.tree.map(lambda a: a[0], potentials)
        rest = jax.tree.map(lambda a: a[1:], potentials)
        state, out0 = init_fn(first)
        state, outs = jax.lax.scan(step_fn, state, rest)
        outs = jax.tree.map(
            lambda f, r: jnp.concatenate([f[None], r], axis=0), out0, outs)
        return state, outs

    def window_step_fn(state, potentials):
        return jax.lax.scan(step_fn, state, potentials)

    return window_init_fn, window_step_fn


def replay(init_fn, step_fn, potentials):
    """One-shot replay of a stored sequence through an online filter:
    ``outs = replay(init_fn, step_fn, (J_diag, h))`` with (T, d) inputs
    returns the stacked per-frame outputs (and is just the W=T window
    filter). Convenience for offline scoring / segmentation of recorded
    streams with the streaming semantics."""
    window_init_fn, _ = make_window_filter(init_fn, step_fn)
    _, outs = window_init_fn(potentials)
    return outs
