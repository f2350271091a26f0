"""Real ``train.loop.run`` throughput vs the chained-dispatch benchmark.

bench.py measures train-step throughput by chaining dispatches and fencing
once (`_lump_time`) -- the best a training loop can do. This script checks
the PRODUCTION loop actually reaches that number: it runs
``svae_tpu.train.loop.run`` (shuffling, batch slicing, callback machinery,
deferred ELBO history) at the bench config and asserts the measured
steps/sec is within tolerance of the chained-dispatch figure, recording
both in ``benchmarks/out/loop_throughput.json``.

This is the regression gate for the loop staying sync-free: a host fence
per step costs ~25 ms on this axon-tunneled host -- more than the ~4.5 ms
step itself -- so any accidental `float()`/`device_get` in the hot loop
shows up as a large ratio drop (reference: upstream svae's optimizer loop
printed the ELBO every iteration, fine on CPU, fatal over a device tunnel;
svae/optimizers.py).

Usage:  /opt/venv/bin/python benchmarks/loop_throughput.py
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, T, D_OBS, D = 64, 100, 20, 10
EPOCHS, SEQS = 4, 16 * 64  # 16 steps/epoch, 64 steps total


def build(backend="auto"):
    from svae_tpu.data import make_dot_data
    from svae_tpu.models import lds
    from svae_tpu.nets import decoders, recognition
    from svae_tpu.train import loop as loop_lib

    data = jnp.asarray(make_dot_data(num_seqs=SEQS, T=T, image_width=D_OBS))
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    pgm_prior = lds.init_pgm_param(k1, D)
    pgm_params = lds.init_pgm_param(k2, D)
    net_params = (
        recognition.init_mlp_recognize(k3, D_OBS, (64,), D),
        decoders.init_mlp_decode(k4, D, (64,), D_OBS),
    )
    opt_init, train_step = loop_lib.make_train_step(
        partial(lds.run_inference, backend=backend),
        recognition.mlp_recognize, decoders.mlp_loglike,
        pgm_prior, data.shape[0], num_samples=2, donate=False,
    )
    return loop_lib, train_step, pgm_params, net_params, \
        opt_init(pgm_params, net_params), data


def main():
    import bench  # repo root (sys.path[0] after insert above)

    report = {"device": str(jax.devices()[0]),
              "on_tpu": jax.devices()[0].platform == "tpu",
              "shapes": {"B": B, "T": T, "d_obs": D_OBS, "d": D}}

    loop_lib, train_step, pgm, net, opt, data = build()

    K_GRP = 16  # production loop shape: a whole epoch per dispatch

    # warm the compile cache (same programs loop.run dispatches, incl. the
    # shuffle permutation + batch gather) with one untimed epoch each way
    pgm, net, opt, _, _ = loop_lib.run(
        train_step, pgm, net, opt, data, jax.random.PRNGKey(1),
        num_epochs=1, batch_size=B, callback_every=1_000_000)
    pgm, net, opt, _, _ = loop_lib.run(
        train_step, pgm, net, opt, data, jax.random.PRNGKey(1),
        num_epochs=1, batch_size=B, callback_every=1_000_000,
        steps_per_dispatch=K_GRP)

    t0 = time.perf_counter()
    p, n, o, hist, _ = loop_lib.run(
        train_step, pgm, net, opt, data, jax.random.PRNGKey(2),
        num_epochs=EPOCHS, batch_size=B, callback_every=1_000_000,
        steps_per_dispatch=K_GRP)
    dt_loop = (time.perf_counter() - t0) / len(hist)
    assert np.isfinite(hist[-1]), "non-finite ELBO in loop run"
    loop_seqs = B / dt_loop
    report["loop_run_seqs_per_sec"] = round(loop_seqs, 2)
    report["loop_run_step_ms"] = round(dt_loop * 1e3, 3)
    report["steps_per_dispatch"] = K_GRP
    print(f"loop.run(k={K_GRP}): {loop_seqs:.0f} seqs/s "
          f"({dt_loop * 1e3:.2f} ms/step, {len(hist)} steps)", flush=True)

    t0 = time.perf_counter()
    _, _, _, hist1, _ = loop_lib.run(
        train_step, pgm, net, opt, data, jax.random.PRNGKey(2),
        num_epochs=1, batch_size=B, callback_every=1_000_000)
    dt1 = (time.perf_counter() - t0) / len(hist1)
    report["loop_run_per_step_dispatch_seqs_per_sec"] = round(B / dt1, 2)
    print(f"loop.run(k=1): {B / dt1:.0f} seqs/s (per-dispatch overhead "
          f"reference)", flush=True)

    bench_seqs, bench_dt = bench.measure_tpu_steps("auto", B=B, T=T,
                                                   d_obs=D_OBS, d_latent=D)
    report["bench_chained_seqs_per_sec"] = round(bench_seqs, 2)
    ratio = loop_seqs / bench_seqs
    report["loop_over_bench_ratio"] = round(ratio, 4)
    print(f"chained-dispatch bench: {bench_seqs:.0f} seqs/s -> "
          f"loop/bench ratio {ratio:.3f}", flush=True)

    # loop.run pays real data shuffling + batch gathers the bench skips;
    # the gate is "no per-step host fence", i.e. >= 0.85 of chained rate.
    report["pass"] = bool(ratio >= 0.85)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "loop_throughput.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report), flush=True)
    if not report["pass"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
