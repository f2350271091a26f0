"""Where does the SLDS E-step's per-sweep time go? (round-4 verdict
weak #4's un-done profiling half.)

Times each stage of one structured-mean-field sweep at the config-3
shape (B=16, T=50, K=4, d=3) and at the lane-folded shape (B=64) with
the stacked-scan protocol of profile_conv_lds:

  pairs_avg   state-averaged pair potentials  sum_k r_k E[pair_k]
  fb_pass     bidirectional Kalman filter pass (per-sequence pairs)
  assembly    smoothed-moment assembly
  zstep       pair energies + HMM forward-backward posterior
  sweep       one full x-step + z-step round
  estep       the full slds.run_inference (10 sweeps + sampling + stats)

Writes benchmarks/out/slds_profile.json.

Usage:  /opt/venv/bin/python benchmarks/profile_slds.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

T, K, D = 50, 4, 3
K_FUSED = 8
NUM_ITERS = 10


def _slope_time_scan(fn, xs_stack, k_lo=8, k_hi=40, iters=6, passes=3):
    """Per-call device time of ``fn`` via the slope method: jit a scan of
    k inner calls (cycling through the stacked distinct inputs, carry
    perturbing them so nothing repeats or hoists), time chained dispatches
    at two k values, slope out the 1.5-10 ms drifting per-dispatch tunnel
    overhead that plain stage timing reads as signal at these sub-ms
    shapes."""
    n = jax.tree.leaves(xs_stack)[0].shape[0]

    def make(k):
        @jax.jit
        def run(xs, seed):
            def body(carry, i):
                acc = carry
                x = jax.tree.map(
                    lambda v: jax.lax.dynamic_index_in_dim(
                        v, i % n, keepdims=False)
                    + acc * jnp.asarray(1e-30, v.dtype)
                    if jnp.issubdtype(v.dtype, jnp.floating)
                    else jax.lax.dynamic_index_in_dim(v, i % n,
                                                      keepdims=False),
                    xs)
                return acc + fn(x), None
            acc, _ = jax.lax.scan(body, seed, jnp.arange(k))
            return acc * jnp.asarray(1e-12, seed.dtype)
        return run

    runs = {k: make(k) for k in (k_lo, k_hi)}
    seed = jnp.zeros((), jnp.float32)
    for k in (k_lo, k_hi):
        seed = runs[k](xs_stack, seed)
    jax.block_until_ready(seed)
    for k in (k_lo, k_hi):  # chained warmup
        seed = runs[k](xs_stack, seed)
    jax.block_until_ready(seed)
    t_at = {k_lo: [], k_hi: []}
    for _ in range(passes):
        for k in (k_lo, k_hi):
            t0 = time.perf_counter()
            s = seed
            for _ in range(iters):
                s = runs[k](xs_stack, s)
            jax.block_until_ready(s)
            t_at[k].append((time.perf_counter() - t0) / iters)
    assert np.isfinite(float(s))
    slopes = [(hi - lo) / (k_hi - k_lo)
              for lo, hi in zip(t_at[k_lo], t_at[k_hi])]
    return max(slopes), (min(slopes), max(slopes))


def run(B):
    from svae_tpu.expfam import dirichlet, mniw, niw
    from svae_tpu.models import slds
    from svae_tpu.ops import pallas_vjp, pallas_hmm

    interpret = jax.default_backend() != "tpu"
    bk = "xla" if interpret else "pallas"
    key = jax.random.PRNGKey(0)
    glob = slds.init_pgm_param(key, K, D)
    k1, k2, k3 = jax.random.split(key, 3)
    Js = jax.nn.softplus(jax.random.normal(k1, (K_FUSED, B, T, D))) + 0.5
    hs = jax.random.normal(k2, (K_FUSED, B, T, D))
    r = jax.nn.softmax(jax.random.normal(k3, (K_FUSED, B, T, K)), axis=-1)

    init_dir, trans_dir, niw_np, mniw_np = glob
    e_pi0 = dirichlet.expectedstats(init_dir)
    e_Pi = dirichlet.expectedstats(trans_dir)
    (I1, I2), Ic = niw.expected_gaussian_natparam(niw_np)
    E_pair = mniw.expected_pair_potential(mniw_np)
    chain_init = (I1, I2, Ic)

    out = {}

    def stage(name, fn, xs):
        dt, (lo, hi) = _slope_time_scan(fn, xs)
        out[name] = round(dt * 1e3, 4)
        out[name + "_spread"] = [round(lo * 1e3, 4), round(hi * 1e3, 4)]
        print(f"B={B} {name:10s} {dt * 1e3:8.4f} ms  "
              f"[{lo * 1e3:.4f}, {hi * 1e3:.4f}]", flush=True)

    def nodes_of(J, h):
        N1 = -0.5 * jnp.vectorize(jnp.diag, signature="(d)->(d,d)")(J)
        return (N1, h)

    stage("pairs_avg", lambda x: sum(
        jnp.sum(jnp.abs(p)) for p in
        slds._averaged_pairs_b(E_pair, x[:, 1:])) * 1e-6, r)

    pairs0 = slds._averaged_pairs_b(E_pair, r[0, :, 1:])

    def fb(x):
        J, h = x
        logZ, Jf, hf, Jb, hb = pallas_vjp.fb_pass(
            chain_init, pairs0, nodes_of(J, h), interpret=interpret)
        return jnp.sum(logZ) * 1e-3 + jnp.sum(jnp.abs(hf)) * 1e-9

    stage("fb_pass", fb, (Js, hs))

    nds0 = nodes_of(Js[0], hs[0])
    _, Jf0, hf0, Jb0, hb0 = pallas_vjp.fb_pass(
        chain_init, pairs0, nds0, interpret=interpret)

    def asm(x):
        Jf, hf, Jb, hb = x
        Ex, ExxT, Exnxt = pallas_vjp._smoother_assembly(
            pairs0, nds0, Jf, hf, Jb, hb)
        return (jnp.sum(jnp.abs(Ex)) + jnp.sum(jnp.abs(Exnxt))) * 1e-6

    msg_stack = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (K_FUSED,) + a.shape),
        (Jf0, hf0, Jb0, hb0))
    stage("assembly", asm, msg_stack)

    Ex0, ExxT0, Exnxt0 = pallas_vjp._smoother_assembly(
        pairs0, nds0, Jf0, hf0, Jb0, hb0)
    xps0 = slds._x_pair_stats_b(Ex0, ExxT0, Exnxt0)

    def zstep(x):
        xps = jax.tree.map(lambda a: a, x)
        L = slds._pair_energies_b(E_pair, xps)
        log_obs = jnp.concatenate(
            [jnp.zeros((B, 1, K), L.dtype), L], axis=1)
        logZ_z, rr, pair_marg, r1 = pallas_hmm.hmm_posterior(
            e_pi0, e_Pi, log_obs, interpret=interpret)
        return jnp.sum(logZ_z) * 1e-3 + jnp.sum(rr) * 1e-6

    xps_stack = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (K_FUSED,) + a.shape), xps0)
    stage("zstep", zstep, xps_stack)

    def sweep(x):
        J, h, rr = x
        nds = nodes_of(J, h)
        pairs = slds._averaged_pairs_b(E_pair, rr[:, 1:])
        logZ_x, Jf, hf, Jb, hb = pallas_vjp.fb_pass(
            chain_init, pairs, nds, interpret=interpret)
        Ex, ExxT, Exnxt = pallas_vjp._smoother_assembly(
            pairs, nds, Jf, hf, Jb, hb)
        L = slds._pair_energies_b(
            E_pair, slds._x_pair_stats_b(Ex, ExxT, Exnxt))
        log_obs = jnp.concatenate(
            [jnp.zeros((B, 1, K), L.dtype), L], axis=1)
        logZ_z, r_new, _, _ = pallas_hmm.hmm_posterior(
            e_pi0, e_Pi, log_obs, interpret=interpret)
        return jnp.sum(logZ_z) * 1e-3 + jnp.sum(r_new) * 1e-6

    stage("sweep", sweep, (Js, hs, r))

    def estep(x):
        J, h, k_bits = x
        kk = jax.random.fold_in(jax.random.PRNGKey(5),
                                jnp.asarray(k_bits, jnp.int32))
        s, stats, gkl, lkl = slds.run_inference(
            glob, glob, (J, h), kk, num_samples=2,
            num_meanfield_iters=NUM_ITERS, backend=bk,
            interpret=interpret)
        return lkl * 1e-6 + jnp.sum(s[0, 0, 0]) * 1e-3

    stage("estep", estep, (Js, hs, jnp.arange(K_FUSED)))
    return out


def main():
    report = {"device": str(jax.devices()[0]),
              "on_tpu": jax.devices()[0].platform == "tpu",
              "shapes": {"T": T, "K": K, "d": D, "k_fused": K_FUSED,
                         "num_iters": NUM_ITERS}}
    for B in (16, 64):
        report[f"B{B}"] = run(B)
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "slds_profile.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
