"""On-chip Pallas-vs-XLA parity check (run on the real TPU).

The pytest suite verifies the Pallas kernels in interpreter mode on CPU;
this script is the Mosaic-lowering gate: it drives the SAME public API
(``models/lds.run_inference``) through both backends ON DEVICE and asserts
value + gradient parity at f32 tolerances, then records the pass (and the
train-step speedup) in ``benchmarks/out/onchip_parity.json`` so lowering
regressions cannot hide behind interpret-mode CI.

Usage:  /opt/venv/bin/python benchmarks/onchip_parity.py
(reference: upstream svae validated its Cython fast path against the
autograd path the same way -- svae/lds/test_lds_inference.py)
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

from svae_tpu.data import make_dot_data
from svae_tpu.models import lds
from svae_tpu.nets import decoders, recognition
from svae_tpu.train import loop as loop_lib

B, T, D_OBS, D = 64, 100, 20, 10


def main():
    report = {"device": str(jax.devices()[0]),
              "on_tpu": jax.devices()[0].platform == "tpu",
              "shapes": {"B": B, "T": T, "d_obs": D_OBS, "d": D}}
    key = jax.random.PRNGKey(0)
    glob = lds.init_pgm_param(key, D)
    k1, k2 = jax.random.split(key)
    J = jax.nn.softplus(jax.random.normal(k1, (B, T, D))) + 0.5
    h = jax.random.normal(k2, (B, T, D))

    # ---- 1) value parity on the public API ----
    outs = {}
    for backend in ("pallas", "xla"):
        f = jax.jit(lambda J, h, k, b=backend: lds.run_inference(
            glob, glob, (J, h), k, 2, backend=b))
        t0 = time.time()
        outs[backend] = f(J, h, jax.random.PRNGKey(1))
        jax.block_until_ready(outs[backend])
        print(f"{backend} fwd compile+run {time.time() - t0:.1f}s", flush=True)
    _, st_p, _, lkl_p = outs["pallas"]
    _, st_x, _, lkl_x = outs["xla"]
    stat_errs = jax.tree.map(
        lambda x, y: float(jnp.max(jnp.abs(x - y) / (jnp.abs(y) + 1.0))),
        st_p, st_x)
    report["stats_max_rel_err"] = max(jax.tree.leaves(stat_errs))
    report["local_kl_rel_err"] = abs(
        float(lkl_p) - float(lkl_x)) / abs(float(lkl_x))
    assert report["stats_max_rel_err"] < 2e-3, stat_errs
    assert report["local_kl_rel_err"] < 2e-3

    # ---- 2) grad parity through the deterministic KL channel ----
    def make_grad(backend):
        def loss(glob_pots, key):
            g, (J, h) = glob_pots
            _, _, gkl, lkl = lds.run_inference(glob, g, (J, h), key, 2,
                                               backend=backend)
            return lkl / B + gkl / (B * T)
        return jax.jit(jax.grad(loss))

    g_p = make_grad("pallas")((glob, (J, h)), jax.random.PRNGKey(2))
    g_x = make_grad("xla")((glob, (J, h)), jax.random.PRNGKey(2))
    jax.block_until_ready((g_p, g_x))
    rel = jax.tree.map(
        lambda x, y: float(jnp.max(jnp.abs(x - y) / (jnp.abs(y) + 1e-2))),
        g_p, g_x)
    report["grad_max_rel_err"] = max(jax.tree.leaves(rel))
    print("grad max rel err:", report["grad_max_rel_err"], flush=True)
    assert report["grad_max_rel_err"] < 5e-2  # f32, different reduction order
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree.leaves(g_p))

    # ---- 3) train-step throughput, both backends ----
    data = jnp.asarray(make_dot_data(num_seqs=B, T=T, image_width=D_OBS))
    ks = jax.random.split(key, 4)
    prior = lds.init_pgm_param(ks[0], D)
    params = lds.init_pgm_param(ks[1], D)
    net = (recognition.init_mlp_recognize(ks[2], D_OBS, (64,), D),
           decoders.init_mlp_decode(ks[3], D, (64,), D_OBS))

    def bench_step(backend, iters=20):
        run_inf = partial(lds.run_inference, backend=backend)
        opt_init, step = loop_lib.make_train_step(
            run_inf, recognition.mlp_recognize, decoders.mlp_loglike,
            prior, 50 * B, num_samples=2, donate=False)
        s = opt_init(params, net)
        p, n, st_, e, _ = step(params, net, s, data, jax.random.PRNGKey(1))
        jax.block_until_ready(e)
        state, dts = [p, n, st_, e], []
        for _ in range(2):
            t0 = time.perf_counter()
            p, n, st_, e = state
            for i in range(iters):
                p, n, st_, e, _ = step(p, n, st_, data,
                                       jax.random.PRNGKey(2 + i))
            jax.block_until_ready(e)
            dts.append((time.perf_counter() - t0) / iters)
            state = [p, n, st_, e]
        assert np.isfinite(float(e)), backend
        print(f"{backend}: {max(dts) * 1e3:.2f} ms/step", flush=True)
        return B / max(dts)

    sp, sx = bench_step("pallas"), bench_step("xla")
    report["train_step_seqs_per_sec"] = {"pallas": round(sp, 1),
                                         "xla": round(sx, 1)}
    report["train_step_speedup"] = round(sp / sx, 2)

    # ---- 4) ragged batches (lengths=) across backends, LDS + SLDS ----
    lengths = jnp.asarray([T] * (B - 2) + [T // 2, T // 3])
    for backend in ("pallas", "xla"):
        f = jax.jit(lambda J, h, k, b=backend: lds.run_inference(
            glob, glob, (J, h), k, 1, backend=b, lengths=lengths)[1:])
        outs[backend] = f(J, h, jax.random.PRNGKey(3))
        jax.block_until_ready(outs[backend])
    rel = jax.tree.map(
        lambda x, y: float(jnp.max(jnp.abs(x - y) / (jnp.abs(y) + 1.0))),
        outs["pallas"][0], outs["xla"][0])
    report["ragged_stats_max_rel_err"] = max(jax.tree.leaves(rel))
    assert report["ragged_stats_max_rel_err"] < 2e-3, rel

    from svae_tpu.models import slds
    Ks, ds, Bs, Ts = 4, 3, 16, 50
    sglob = slds.init_pgm_param(jax.random.PRNGKey(7), Ks, ds)
    kj, kh = jax.random.split(jax.random.PRNGKey(8))
    Js = jax.nn.softplus(jax.random.normal(kj, (Bs, Ts, ds))) + 0.5
    hs = jax.random.normal(kh, (Bs, Ts, ds))
    slens = jnp.asarray([Ts] * (Bs - 2) + [Ts // 2, Ts // 3])
    souts = {}
    for backend in ("pallas", "xla"):
        f = jax.jit(lambda J, h, k, b=backend: slds.run_inference(
            sglob, sglob, (J, h), k, 1, num_meanfield_iters=5, backend=b,
            lengths=slens)[1:])
        souts[backend] = f(Js, hs, jax.random.PRNGKey(9))
        jax.block_until_ready(souts[backend])
    rel = jax.tree.map(
        lambda x, y: float(jnp.max(jnp.abs(x - y) / (jnp.abs(y) + 1.0))),
        souts["pallas"][0], souts["xla"][0])
    report["slds_ragged_stats_max_rel_err"] = max(jax.tree.leaves(rel))
    print("slds ragged stats max rel err:",
          report["slds_ragged_stats_max_rel_err"], flush=True)
    assert report["slds_ragged_stats_max_rel_err"] < 5e-3, rel

    # ---- 5) bf16 net compute path: parity + matmul speed ratio ----
    hw = (16, 16)
    cparams = recognition.init_conv_recognize(
        jax.random.PRNGKey(10), hw, (16, 32), 3, D)
    frames = jax.random.normal(jax.random.PRNGKey(11), (B * 32, 256))
    f32fn = jax.jit(lambda p, x: recognition.conv_recognize(p, x, hw))
    bffn = jax.jit(lambda p, x: recognition.conv_recognize(
        p, x, hw, compute_dtype=jnp.bfloat16))
    o32 = f32fn(cparams, frames)
    obf = bffn(cparams, frames)
    jax.block_until_ready((o32, obf))
    err = max(float(jnp.max(jnp.abs(a - b)))
              for a, b in zip(o32, obf))
    report["bf16_conv_abs_err"] = err
    assert err < 0.15, err

    def _time(fn, iters=30):
        dts = []
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(cparams, frames)
            jax.block_until_ready(out)
            dts.append((time.perf_counter() - t0) / iters)
        return max(dts)

    t32, tbf = _time(f32fn), _time(bffn)
    report["bf16_conv_speedup"] = round(t32 / tbf, 2)
    print(f"conv recognize f32 {t32 * 1e3:.2f} ms, bf16 {tbf * 1e3:.2f} ms "
          f"({t32 / tbf:.2f}x)", flush=True)

    report["passed"] = True

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "onchip_parity.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    print("ON-CHIP PALLAS PARITY PASSED")


if __name__ == "__main__":
    main()
