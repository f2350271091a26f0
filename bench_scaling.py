"""Data-parallel scaling-efficiency benchmark (BASELINE.json north star:
">= 80% scaling efficiency at >= 2 hosts").

Measures SVI steps/sec of the shard_map LDS-SVAE train step at data-parallel
degrees 1, 2, 4, ... up to the device count, with the per-shard batch held
fixed (weak scaling: global batch grows with the mesh). On a real pod slice
run one process per host (jax.distributed via examples/bigdata_dp.py); on a
single host this exercises the same collective code paths over however many
devices exist (set XLA_FLAGS=--xla_force_host_platform_device_count=8 for a
virtual CPU mesh -- numbers then characterize the code path, not ICI).

Prints one JSON line per mesh size plus a final efficiency summary line.
"""

import json
import os
import time

os.makedirs(os.path.join(os.path.dirname(__file__), ".jax_cache"),
            exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
# SVAE_SCALING_PLATFORM=cpu forces the virtual CPU mesh (the axon
# sitecustomize overrides the JAX_PLATFORMS env var, so a shell-level
# setting does not stick -- only this post-import config wins).
if os.environ.get("SVAE_SCALING_PLATFORM"):
    jax.config.update("jax_platforms",
                      os.environ["SVAE_SCALING_PLATFORM"])

import jax.numpy as jnp

from svae_tpu.data import make_dot_data
from svae_tpu.models import lds
from svae_tpu.nets import recognition, decoders
from svae_tpu.parallel import make_mesh, make_dp_train_step


def measure(data_parallel, per_shard_batch=4, T=30, d_obs=16, d=8,
            iters=5):
    B = per_shard_batch * data_parallel
    N = 20 * B
    mesh = make_mesh(data=data_parallel, mc=1)
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    prior = lds.init_pgm_param(k1, d)
    params = lds.init_pgm_param(k2, d)
    net = (recognition.init_mlp_recognize(k3, d_obs, (64,), d),
           decoders.init_mlp_decode(k4, d, (64,), d_obs))
    data = jnp.asarray(make_dot_data(num_seqs=B, T=T, image_width=d_obs))
    opt_init, step = make_dp_train_step(
        lds.run_inference, recognition.mlp_recognize, decoders.mlp_loglike,
        prior, N, mesh, B, num_samples=2, donate=False)
    s = opt_init(params, net)
    p, n = params, net
    p, n, s, e, _ = step(p, n, s, data, jax.random.PRNGKey(1))
    jax.block_until_ready(e)
    t0 = time.perf_counter()
    for i in range(iters):
        p, n, s, e, _ = step(p, n, s, data, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(e)
    dt = (time.perf_counter() - t0) / iters
    assert bool(jnp.isfinite(e))
    return B / dt, dt


def main():
    ndev = len(jax.devices())
    degrees = []
    d = 1
    while d <= ndev:
        degrees.append(d)
        d *= 2
    results = {}
    for deg in degrees:
        seqs_per_sec, dt = measure(deg)
        results[deg] = seqs_per_sec
        print(json.dumps({
            "metric": "dp_weak_scaling_seqs_per_sec",
            "data_parallel": deg,
            "value": round(seqs_per_sec, 2),
            "unit": "seqs/sec",
        }))
    base = results[degrees[0]]
    eff = {
        deg: round(results[deg] / (base * deg), 3) for deg in degrees
    }
    print(json.dumps({
        "metric": "dp_weak_scaling_efficiency",
        "efficiency_vs_1": eff,
        "devices": ndev,
    }))


if __name__ == "__main__":
    main()
