"""Experiment runner: wires TrainConfig into the loop with metrics,
checkpointing, profiling, and NaN-guard flags (the observability layer --
SURVEY.md section 5)."""

import os
import time

import jax
import numpy as np
import jax.numpy as jnp

from svae_tpu.train import checkpoint as ckpt_lib
from svae_tpu.train import loop as loop_lib
from svae_tpu.train.metrics import MetricsWriter


def _restore_with_counters(path, head_state, n_counters, cast=False):
    """Restore ``head_state + (counter,) * n_counters`` trying int64 then
    int32 counter templates: the v2 dtype check is strict, and checkpoints
    written before the int64 pinning stored step counters in whichever
    width the writer's x64 mode produced. ``cast`` (TrainConfig
    .checkpoint_cast) forwards to checkpoint.restore's opt-in lossy dtype
    coercion, so precision-migrated checkpoints stay recoverable through
    the experiment entry points."""
    for ctype in (np.int64, np.int32):
        state = head_state + tuple(
            np.zeros((), ctype) for _ in range(n_counters))
        try:
            return ckpt_lib.restore(path, state, cast=cast)
        except ValueError as e:
            if "dtype mismatch" not in str(e) or ctype is np.int32:
                raise
    raise AssertionError("unreachable")


def run(train_cfg, train_step, pgm_params, net_params, opt_state, data,
        extra_callback=None):
    """Run the training loop per ``TrainConfig``; returns
    ``(pgm_params, net_params, opt_state, history)``.

    Resumes from the latest checkpoint in ``checkpoint_dir`` if present.
    Checkpoint state = (pgm, net, opt, key, step) where ``key`` is the PRNG
    key ADVANCED past the checkpointed step, so a resumed run continues the
    randomness stream instead of replaying it. Resume granularity is the
    epoch: completed epochs (step // steps_per_epoch) are skipped, so a
    checkpoint taken at an epoch boundary (``checkpoint_every`` divisible
    by steps-per-epoch) resumes with the exact batch/noise sequence of the
    uninterrupted run (tested: tests/test_train.py preemption-resume).
    Mid-epoch checkpoints resume from the enclosing epoch's start with the
    advanced key -- a coherent fresh stream, not a replay.

    Metrics are appended as JSONL every ``metrics_every`` steps; between
    firings the loop never fences the device (throughput then matches the
    chained-dispatch benchmark).
    """
    if train_cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)

    key = jax.random.PRNGKey(train_cfg.seed)
    start_step = 0
    if train_cfg.checkpoint_dir:
        os.makedirs(train_cfg.checkpoint_dir, exist_ok=True)
        latest = ckpt_lib.latest(train_cfg.checkpoint_dir)
        if latest is not None:
            # step counter pinned to a jax-config-independent dtype
            # (np.int64): jnp.asarray(int) is int32 or int64 depending on
            # x64 mode, which would trip the restore dtype check.
            # Checkpoints written before this pinning stored the step as
            # int32/int64 per the writer's x64 mode -- retry counter-only
            # templates so pre-upgrade runs stay resumable.
            pgm_params, net_params, opt_state, key, step_arr = (
                _restore_with_counters(latest,
                                       (pgm_params, net_params, opt_state,
                                        key), 1,
                                       cast=getattr(train_cfg,
                                                    "checkpoint_cast",
                                                    False)))
            key = jnp.asarray(key)
            start_step = int(step_arr)

    num_batches = max(data.shape[0] // train_cfg.batch_size, 1)
    epochs_done = min(start_step // num_batches, train_cfg.num_epochs)
    start_step = epochs_done * num_batches  # epoch-granular resume
    epochs_left = train_cfg.num_epochs - epochs_done

    writer = MetricsWriter(train_cfg.metrics_path)
    t_last = [time.perf_counter()]
    every = max(int(train_cfg.metrics_every), 1)
    last_fired = [start_step - 1]   # last global step a callback covered
    last_ckpt = [start_step // max(train_cfg.checkpoint_every, 1)]

    if train_cfg.profile_dir:
        jax.profiler.start_trace(train_cfg.profile_dir)

    def callback(step, elbo, params, terms=None, loop_key=None):
        now = time.perf_counter()
        dt = now - t_last[0]
        t_last[0] = now
        global_step = start_step + step
        extra = {}
        if terms is not None:
            extra = {k: float(v) for k, v in terms.items()}
        # true steps since the previous firing: with grouped dispatch
        # (steps_per_dispatch > 1) the callback cadence rounds to group
        # boundaries, so dividing by metrics_every would overstate the
        # step time by the group factor
        n_steps = max(global_step - last_fired[0], 1)
        last_fired[0] = global_step
        per_step = dt / n_steps
        writer.write(global_step, elbo=elbo, step_time_s=round(per_step, 5),
                     steps_per_sec=round(1.0 / max(per_step, 1e-9), 3),
                     **extra)
        # checkpoint when a cadence boundary was CROSSED since the last
        # firing (exact-multiple equality never holds when the boundary
        # falls inside a dispatch group)
        ckpt_idx = (global_step + 1) // max(train_cfg.checkpoint_every, 1)
        if train_cfg.checkpoint_dir and ckpt_idx > last_ckpt[0]:
            last_ckpt[0] = ckpt_idx
            p, n, s = params
            ckpt_lib.save(
                os.path.join(train_cfg.checkpoint_dir,
                             f"ckpt_{global_step + 1}.npz"),
                (p, n, s, loop_key if loop_key is not None else key,
                 np.asarray(global_step + 1, np.int64)),
            )
        if extra_callback is not None:
            extra_callback(global_step, elbo, params, terms)

    history = []
    final_key = key
    try:
        if epochs_left > 0:
            (pgm_params, net_params, opt_state, history,
             final_key) = loop_lib.run(
                train_step, pgm_params, net_params, opt_state, data, key,
                num_epochs=epochs_left,
                batch_size=train_cfg.batch_size, callback=callback,
                callback_every=every,
                steps_per_dispatch=getattr(train_cfg,
                                           "steps_per_dispatch", 1),
                donate_groups=getattr(train_cfg, "donate_groups", True),
            )
    finally:
        if train_cfg.profile_dir:
            jax.profiler.stop_trace()
        writer.close()

    if train_cfg.checkpoint_dir:
        final_step = start_step + len(history)
        ckpt_lib.save(
            os.path.join(train_cfg.checkpoint_dir,
                         f"ckpt_{final_step}.npz"),
            (pgm_params, net_params, opt_state, final_key,
             np.asarray(final_step, np.int64)),
        )
    return pgm_params, net_params, opt_state, history


def run_with_loader(train_cfg, train_step, pgm_params, net_params,
                    opt_state, get_batches, extra_callback=None):
    """Loader-driven variant of :func:`run` for ragged corpora /
    out-of-HBM datasets (``get_batches(epoch)`` from
    ``data/loader.make_loader``; pair with ``make_train_step(ragged=True)``
    for ``(frames, lengths)`` batches).

    Same JSONL metrics cadence as :func:`run`, and the same
    ``TrainConfig.steps_per_dispatch`` grouping: consecutive same-shape
    (same length-bucket) batches ride one jitted scan dispatch -- pair
    with ``make_loader(group_by_shape=True)`` so buckets emit
    consecutively and groups fill. Checkpoints are
    EPOCH-granular (the per-epoch step count varies with bucketing):
    state = (pgm, net, opt, key, epochs_done, steps_done) written at every
    epoch end; resume skips completed epochs, continues the advanced key's
    randomness stream, and continues the global metrics step numbering.
    Returns (pgm_params, net_params, opt_state, history).
    """
    if train_cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)

    key = jax.random.PRNGKey(train_cfg.seed)
    epochs_done = 0
    steps_done = 0
    if train_cfg.checkpoint_dir:
        os.makedirs(train_cfg.checkpoint_dir, exist_ok=True)
        latest = ckpt_lib.latest(train_cfg.checkpoint_dir,
                                 prefix="ckpt_epoch_")
        if latest is not None:
            pgm_params, net_params, opt_state, key, ep_arr, st_arr = (
                _restore_with_counters(latest,
                                       (pgm_params, net_params, opt_state,
                                        key), 2,
                                       cast=getattr(train_cfg,
                                                    "checkpoint_cast",
                                                    False)))
            key = jnp.asarray(key)
            epochs_done = min(int(ep_arr), train_cfg.num_epochs)
            steps_done = int(st_arr)

    writer = MetricsWriter(train_cfg.metrics_path)
    t_last = [time.perf_counter()]
    every = max(int(train_cfg.metrics_every), 1)
    step_base = [steps_done]
    last_fired = [steps_done - 1]  # last global step a callback covered

    def callback(step, elbo, params, terms=None, loop_key=None):
        now = time.perf_counter()
        dt = now - t_last[0]
        t_last[0] = now
        extra = ({k: float(v) for k, v in terms.items()}
                 if terms is not None else {})
        global_step = step_base[0] + step
        # true steps since the previous firing (same fix as run()'s
        # callback): with grouped dispatch the cadence rounds to group
        # boundaries, so dividing by metrics_every would overstate the
        # step time by the group factor
        n_steps = max(global_step - last_fired[0], 1)
        last_fired[0] = global_step
        per_step = dt / n_steps
        writer.write(global_step, elbo=elbo,
                     step_time_s=round(per_step, 5),
                     steps_per_sec=round(1.0 / max(per_step, 1e-9), 3),
                     **extra)
        if extra_callback is not None:
            extra_callback(global_step, elbo, params, terms)

    history = []
    if train_cfg.profile_dir:
        jax.profiler.start_trace(train_cfg.profile_dir)
    try:
        for epoch in range(epochs_done, train_cfg.num_epochs):
            (pgm_params, net_params, opt_state, h, key) = (
                loop_lib.run_loader(
                    train_step, pgm_params, net_params, opt_state,
                    lambda _e, ep=epoch: get_batches(ep), key,
                    num_epochs=1, callback=callback, callback_every=every,
                    steps_per_dispatch=getattr(train_cfg,
                                               "steps_per_dispatch", 1),
                    donate_groups=getattr(train_cfg, "donate_groups",
                                          True)))
            history.extend(h)
            step_base[0] += len(h)
            if train_cfg.checkpoint_dir:
                ckpt_lib.save(
                    os.path.join(train_cfg.checkpoint_dir,
                                 f"ckpt_epoch_{epoch + 1}.npz"),
                    (pgm_params, net_params, opt_state, key,
                     np.asarray(epoch + 1, np.int64),
                     np.asarray(step_base[0], np.int64)),
                )
    finally:
        if train_cfg.profile_dir:
            jax.profiler.stop_trace()
        writer.close()
    return pgm_params, net_params, opt_state, history
