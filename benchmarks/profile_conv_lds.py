"""Where does the conv-LDS (BASELINE config 4) train step's time go?

Round-4 left config 4 as the weakest multiplier (driver: 318.8 seqs/s,
17% spread) with no breakdown of its ~21-26 ms step. This script times
each stage of the step in isolation with the same honest protocol as
bench.py (k distinct inputs scanned inside one jit, chained dispatches
carrying state so no dispatch ever repeats bit-identical inputs,
slowest-of-three passes):

  recognize        conv recognition net forward (B*T=4000 frames im2col)
  estep_fwd        packed stationary Pallas E-step forward (B=8, T=500)
  decoder          MLP decoder log-likelihood forward (S=2 samples)
  objective_fwd    full ELBO forward (all three composed)
  recognize_vjp    value_and_grad of the conv net alone
  estep_vjp        value_and_grad through the E-step alone
  decoder_vjp      value_and_grad of the decoder alone
  train_step       the full fused SVI step (bench.py's number)

Writes benchmarks/out/conv_lds_profile.json and prints the table.

Usage:  /opt/venv/bin/python benchmarks/profile_conv_lds.py
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

B, T, HW, D, S = 8, 500, (16, 16), 16, 2
K_FUSED = 4
ITERS = 5


def _time_scan(fn, xs_stack, iters=ITERS, passes=3):
    """Slowest-of-three chained-dispatch time of ``fn`` mapped over
    ``k`` stacked distinct inputs inside one jit. The scalar carry chains
    each output into the NEXT dispatch's inputs (times a tiny epsilon), so
    no two dispatches ever see bit-identical inputs (axon dispatch-cache
    hazard) and nothing hoists out of the scan."""
    k = jax.tree.leaves(xs_stack)[0].shape[0]

    @jax.jit
    def run(xs, acc):
        def body(a, x):
            x = jax.tree.map(lambda v: v + a * jnp.asarray(1e-30, v.dtype),
                             x)
            return a + fn(x), None
        acc, _ = jax.lax.scan(body, acc, xs)
        return acc * jnp.asarray(1e-12, acc.dtype)

    acc = run(xs_stack, jnp.zeros((), jnp.float32))
    jax.block_until_ready(acc)
    for _ in range(2):  # chained warmup (first post-compile dispatch can
        acc = run(xs_stack, acc)  # pay a one-off ~25 ms init)
    jax.block_until_ready(acc)
    dts = []
    for _ in range(passes):
        t0 = time.perf_counter()
        a = acc
        for _ in range(iters):
            a = run(xs_stack, a)
        jax.block_until_ready(a)
        dts.append((time.perf_counter() - t0) / (iters * k))
    assert np.isfinite(float(a)), "non-finite output"
    return max(dts), (min(dts), max(dts))


def main():
    from svae_tpu.models import lds
    from svae_tpu.nets import decoders, recognition
    from svae_tpu.train import loop as loop_lib

    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    d_obs = HW[0] * HW[1]
    rng = np.random.RandomState(0)
    batches = jnp.asarray(rng.rand(K_FUSED, B, T, d_obs).astype(np.float32))
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    pgm_prior = lds.init_pgm_param(k1, D)
    pgm_params = lds.init_pgm_param(k2, D)
    recog_params = recognition.init_conv_recognize(k3, HW, (16, 32), 3, D)
    dec_params = decoders.init_mlp_decode(k4, D, (128,), d_obs)
    recognize = recognition.make_conv_recognize(HW)

    # fixed intermediate products for the isolated stages
    print("setup: recognizing...", flush=True)
    pots0 = recognize(recog_params, batches[0])
    pots_stack = jax.vmap(lambda b: recognize(recog_params, b))(batches)
    print("setup: E-step sample...", flush=True)
    samples0 = lds.run_inference(pgm_prior, pgm_params, pots0,
                                 jax.random.PRNGKey(9), num_samples=S,
                                 backend=backend)[0]
    jax.block_until_ready(samples0)
    print("setup done", flush=True)
    skey = jax.random.PRNGKey(7)

    report = {"device": str(jax.devices()[0]),
              "on_tpu": jax.devices()[0].platform == "tpu",
              "shapes": {"B": B, "T": T, "hw": list(HW), "d": D, "S": S,
                         "k_fused": K_FUSED},
              "backend": backend, "stages_ms": {}, "spread_ms": {}}

    def stage(name, fn, xs):
        dt, (lo, hi) = _time_scan(fn, xs)
        report["stages_ms"][name] = round(dt * 1e3, 3)
        report["spread_ms"][name] = [round(lo * 1e3, 3), round(hi * 1e3, 3)]
        print(f"{name:16s} {dt * 1e3:8.3f} ms  "
              f"[{lo * 1e3:.3f}, {hi * 1e3:.3f}]", flush=True)
        return dt

    # --- forward stages ---
    stage("recognize", lambda b: jnp.sum(jnp.abs(
        recognize(recog_params, b)[1])), batches)

    def estep_fwd(pots):
        s, stats, gkl, lkl = lds.run_inference(
            pgm_prior, pgm_params, pots, skey, num_samples=S,
            backend=backend)
        return jnp.sum(jnp.abs(s)) * 1e-3 + lkl * 1e-6 + gkl * 0.0

    stage("estep_fwd", estep_fwd, pots_stack)

    stage("decoder", lambda b: decoders.mlp_loglike(dec_params, samples0, b),
          batches)

    def objective(params, b):
        rp, dp = params
        pots = recognize(rp, b)
        s, stats, gkl, lkl = lds.run_inference(
            pgm_prior, pgm_params, pots, skey, num_samples=S,
            backend=backend)
        ll = decoders.mlp_loglike(dp, s, b)
        return (ll - lkl) - gkl / (16 * B)

    stage("objective_fwd", lambda b: objective((recog_params, dec_params),
                                               b), batches)

    # --- vjp stages (grad w.r.t. the stage's own params / inputs) ---
    stage("recognize_vjp", lambda b: jax.value_and_grad(
        lambda rp: jnp.sum(jnp.abs(recognize(rp, b)[1])))(recog_params)[0],
        batches)

    def estep_loss(pots):
        s, stats, gkl, lkl = lds.run_inference(
            pgm_prior, pgm_params, pots, skey, num_samples=S,
            backend=backend)
        return jnp.sum(jnp.abs(s)) * 1e-3 + lkl * 1e-6

    stage("estep_vjp", lambda pots: jax.value_and_grad(estep_loss)(pots)[0],
          pots_stack)

    stage("decoder_vjp", lambda b: jax.value_and_grad(
        lambda dp: decoders.mlp_loglike(dp, samples0, b))(dec_params)[0],
        batches)

    stage("objective_vjp", lambda b: jax.value_and_grad(
        lambda ps: objective(ps, b))((recog_params, dec_params))[0],
        batches)

    # --- the full train step, bench.py's protocol ---
    opt_init, fused_step = loop_lib.make_fused_train_step(
        partial(lds.run_inference, backend=backend), recognize,
        decoders.mlp_loglike, pgm_prior, 16 * B, k_steps=K_FUSED,
        num_samples=S, donate=False, stacked_batch=True)
    opt_state = opt_init(pgm_params, net_params := (recog_params,
                                                    dec_params))
    state = [pgm_params, net_params, opt_state, None]
    p, n, st, e, _, _ = fused_step(state[0], state[1], state[2], batches,
                                   jax.random.PRNGKey(1))
    jax.block_until_ready(e)
    state = [p, n, st, e]

    def run_iters(kk):
        p, n, st, e = state
        for i in range(kk):
            p, n, st, e, _, _ = fused_step(p, n, st, batches,
                                           jax.random.PRNGKey(2 + i))
        state[:] = [p, n, st, e]
        return e

    jax.block_until_ready(run_iters(2))
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run_iters(ITERS)
        jax.block_until_ready(out)
        dts.append((time.perf_counter() - t0) / (ITERS * K_FUSED))
    dt = max(dts)
    report["stages_ms"]["train_step"] = round(dt * 1e3, 3)
    report["spread_ms"]["train_step"] = [round(min(dts) * 1e3, 3),
                                         round(max(dts) * 1e3, 3)]
    report["train_seqs_per_sec"] = round(B / dt, 1)
    print(f"{'train_step':16s} {dt * 1e3:8.3f} ms  "
          f"[{min(dts) * 1e3:.3f}, {max(dts) * 1e3:.3f}]  "
          f"-> {B / dt:.1f} seqs/s", flush=True)

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "conv_lds_profile.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
