"""Experiment runner: wires TrainConfig into the loop with metrics,
checkpointing, profiling, and NaN-guard flags (the observability layer --
SURVEY.md section 5)."""

import os
import time

import jax
import jax.numpy as jnp

from svae_tpu.train import checkpoint as ckpt_lib
from svae_tpu.train import loop as loop_lib
from svae_tpu.train.metrics import MetricsWriter


def run(train_cfg, train_step, pgm_params, net_params, opt_state, data,
        extra_callback=None):
    """Run the training loop per ``TrainConfig``; returns
    ``(pgm_params, net_params, opt_state, history)``.

    Resumes from the latest checkpoint in ``checkpoint_dir`` if present
    (state = (pgm, net, opt, key, step)); metrics are appended as JSONL.
    """
    if train_cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)

    key = jax.random.PRNGKey(train_cfg.seed)
    start_step = 0
    if train_cfg.checkpoint_dir:
        os.makedirs(train_cfg.checkpoint_dir, exist_ok=True)
        latest = ckpt_lib.latest(train_cfg.checkpoint_dir)
        if latest is not None:
            state = (pgm_params, net_params, opt_state, key,
                     jnp.zeros((), jnp.int32))
            pgm_params, net_params, opt_state, key, step_arr = (
                ckpt_lib.restore(latest, state))
            key = jnp.asarray(key)
            start_step = int(step_arr)

    writer = MetricsWriter(train_cfg.metrics_path)
    t_last = [time.perf_counter()]

    if train_cfg.profile_dir:
        jax.profiler.start_trace(train_cfg.profile_dir)

    def callback(step, elbo, params, terms=None):
        now = time.perf_counter()
        dt = now - t_last[0]
        t_last[0] = now
        global_step = start_step + step
        extra = {}
        if terms is not None:
            extra = {k: float(v) for k, v in terms.items()}
        writer.write(global_step, elbo=elbo, step_time_s=round(dt, 5),
                     steps_per_sec=round(1.0 / max(dt, 1e-9), 3), **extra)
        if (train_cfg.checkpoint_dir
                and (global_step + 1) % train_cfg.checkpoint_every == 0):
            p, n, s = params
            ckpt_lib.save(
                os.path.join(train_cfg.checkpoint_dir,
                             f"ckpt_{global_step + 1}.npz"),
                (p, n, s, key, jnp.asarray(global_step + 1)),
            )
        if extra_callback is not None:
            extra_callback(global_step, elbo, params, terms)

    try:
        pgm_params, net_params, opt_state, history = loop_lib.run(
            train_step, pgm_params, net_params, opt_state, data, key,
            num_epochs=train_cfg.num_epochs,
            batch_size=train_cfg.batch_size, callback=callback,
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
            (pgm_params, net_params, opt_state, key,
             jnp.asarray(final_step)),
        )
    return pgm_params, net_params, opt_state, history
