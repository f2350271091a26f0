"""Ragged-corpus training throughput: length bucketing vs pad-to-max.

Measures (on the real TPU) one epoch of LDS-SVAE training over a
variable-length corpus through the bucketed loader
(data/loader.ragged_epoch_batches + make_train_step(ragged=True)) against
the naive pad-everything-to-max-T strategy, holding semantics fixed (both
use lengths= exact ragged-batch inference, so the ELBO math is identical
-- only the padded FLOPs differ). Writes
``benchmarks/out/ragged_throughput.json``.

Usage:  /opt/venv/bin/python benchmarks/ragged_throughput.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from svae_tpu.data import loader
from svae_tpu.models import lds
from svae_tpu.nets import decoders, recognition
from svae_tpu.train import loop as loop_lib

D_OBS, D, BATCH = 20, 10, 64
N_SEQS, T_MIN, T_MAX = 512, 64, 512
PAD_MULTIPLE = 64


def corpus(seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randn(int(rng.randint(T_MIN, T_MAX + 1)), D_OBS)
            .astype(np.float32) for _ in range(N_SEQS)]


def main():
    seqs = corpus()
    total_frames = sum(s.shape[0] for s in seqs)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    prior = lds.init_pgm_param(ks[0], D)
    params = lds.init_pgm_param(ks[1], D)
    net = (recognition.init_mlp_recognize(ks[2], D_OBS, (64,), D),
           decoders.init_mlp_decode(ks[3], D, (64,), D_OBS))

    opt_init, step = loop_lib.make_train_step(
        lds.run_inference, recognition.mlp_recognize, decoders.mlp_loglike,
        prior, N_SEQS, num_samples=1, donate=False, ragged=True)
    state0 = opt_init(params, net)

    def epoch_batches(pad_multiple):
        out = []
        for frames, lengths in loader.ragged_epoch_batches(
                seqs, BATCH, seed=1, epoch=0, pad_multiple=pad_multiple,
                drop_remainder=True):
            out.append((jnp.asarray(frames), jnp.asarray(lengths)))
        return out

    def run_epoch(batches, tag):
        padded = sum(int(np.prod(b[0].shape[:2])) for b in batches)
        real = sum(int(b[1].sum()) for b in batches)
        # warm every distinct compiled shape once
        p, n, s = params, net, state0
        for b in batches:
            p, n, s, e, _ = step(p, n, s, b, jax.random.PRNGKey(9))
        jax.block_until_ready(e)
        # timed epoch, chained dispatch, fenced once (the axon tunnel adds
        # ~25 ms per sync; take the slower of two passes like bench.py)
        dts = []
        for _ in range(2):
            p, n, s = params, net, state0
            t0 = time.perf_counter()
            for i, b in enumerate(batches):
                p, n, s, e, _ = step(p, n, s, b, jax.random.PRNGKey(10 + i))
            jax.block_until_ready(e)
            dts.append(time.perf_counter() - t0)
        dt = max(dts)
        nseq = len(batches) * BATCH
        print(f"{tag}: {dt:.3f}s/epoch, {nseq / dt:.1f} seqs/s, "
              f"pad overhead {(padded - real) / real:.1%}", flush=True)
        return {"seconds_per_epoch": round(dt, 4),
                "seqs_per_sec": round(nseq / dt, 1),
                "padded_frames": padded, "real_frames": real,
                "pad_overhead": round((padded - real) / real, 4)}

    report = {
        "device": str(jax.devices()[0]),
        "on_tpu": jax.devices()[0].platform == "tpu",
        "config": {"N": N_SEQS, "T_min": T_MIN, "T_max": T_MAX,
                   "batch": BATCH, "d_obs": D_OBS, "d": D},
        "total_frames": total_frames,
        "bucketed": run_epoch(epoch_batches(PAD_MULTIPLE),
                              f"bucketed(pad_multiple={PAD_MULTIPLE})"),
        "pad_to_max": run_epoch(epoch_batches(T_MAX), "pad_to_max"),
    }
    report["bucketing_speedup"] = round(
        report["pad_to_max"]["seconds_per_epoch"]
        / report["bucketed"]["seconds_per_epoch"], 2)
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "ragged_throughput.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
