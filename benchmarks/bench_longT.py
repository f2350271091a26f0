"""Long-T parallel-in-time benchmark: blocked two-pass chunked scan
(``kalman.lds_smoother(..., parallel=<int chunks>)``) vs the sequential
``lax.scan`` flavor, on the real TPU.

This is the single-chip deployment of temporal parallelization
(arXiv:1905.13002) that sidesteps the XLA:TPU associative_scan compile
blowup (ops/kalman.py header): sequential depth drops from T to
T/C + C with plain-scan compile cost. Records
``benchmarks/out/longT.json``.

Usage:  /opt/venv/bin/python benchmarks/bench_longT.py
(reference scope: upstream svae had no parallel-in-time path at all --
its Cython kernels are O(T) sequential per sequence.)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from svae_tpu.ops import kalman

B, D = 8, 10


def make_pots(B, T, d, seed=0):
    rng = np.random.RandomState(seed)
    A = 0.9 * np.linalg.qr(rng.randn(d, d))[0]
    Qi = np.linalg.inv(0.1 * np.eye(d))
    P1 = np.tile(-0.5 * Qi, (T - 1, 1, 1))
    P2 = np.tile(Qi @ A, (T - 1, 1, 1))
    P3 = np.tile(-0.5 * A.T @ Qi @ A, (T - 1, 1, 1))
    Pc = np.zeros(T - 1)
    init = (-0.5 * np.eye(d), np.zeros(d), 0.0)
    N1 = np.tile(-0.5 * np.eye(d), (B, T, 1, 1))
    N2 = rng.randn(B, T, d) * 0.3
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return (jax.tree.map(f32, init), jax.tree.map(f32, (P1, P2, P3, Pc)),
            (f32(N1), f32(N2)))


def lump(f, args, iters=10):
    out = f(*args)
    jax.block_until_ready(out)
    dts = []
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        dts.append((time.perf_counter() - t0) / iters)
    return max(dts)


def main():
    report = {"device": str(jax.devices()[0]), "B": B, "d": D, "points": []}
    for T in (512, 2048):
        init, pairs, nodes = make_pots(B, T, D)
        vsm = lambda par: jax.jit(jax.vmap(
            lambda n1, n2: kalman.lds_smoother(init, pairs, (n1, n2),
                                               parallel=par),
            in_axes=(0, 0)))
        fseq = vsm(False)
        dt_seq = lump(fseq, nodes)
        print(f"T={T} sequential: {dt_seq * 1e3:.2f} ms", flush=True)
        ref = fseq(*nodes)
        for C in (32, 64, 128):
            if C * 2 > T:
                continue
            fc = vsm(C)
            dt_c = lump(fc, nodes)
            out = fc(*nodes)
            err = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(
                jax.tree.leaves(ref), jax.tree.leaves(out)))
            report["points"].append(
                {"T": T, "chunks": C, "ms": round(dt_c * 1e3, 2),
                 "sequential_ms": round(dt_seq * 1e3, 2),
                 "speedup": round(dt_seq / dt_c, 2),
                 "max_abs_err": float(f"{err:.2e}")})
            print(f"T={T} C={C}: {dt_c * 1e3:.2f} ms  "
                  f"{dt_seq / dt_c:.2f}x  err {err:.2e}", flush=True)
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "longT.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
