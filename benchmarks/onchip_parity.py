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
    report["passed"] = True

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "onchip_parity.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    print("ON-CHIP PALLAS PARITY PASSED")


if __name__ == "__main__":
    main()
