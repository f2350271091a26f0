"""Large-batch data-parallel natural-gradient SVI (BASELINE config 5):
LDS-SVAE over a large synthetic sequence corpus, sharded across all
available devices with psum of natural-gradient statistics.

On a multi-host pod slice, launch one process per host (the script calls
``jax.distributed`` via svae_tpu.parallel.multihost). Single-host it uses
every local device; on CPU set
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` to exercise the
collective paths.

    python examples/bigdata_dp.py [--preset bigdata_dp_smoke] ...
"""

import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from svae_tpu.config import parse_config
from svae_tpu.data import make_dot_data
from svae_tpu.models import lds
from svae_tpu.nets import recognition, decoders
from svae_tpu.parallel import make_mesh, make_dp_train_step, multihost
from svae_tpu.train.metrics import MetricsWriter


def main(argv=None):
    cfg = parse_config("bigdata_dp", argv)
    tc = cfg.train
    if "COORDINATOR_ADDRESS" in os.environ:  # multi-host pod launch
        multihost.initialize()

    mesh = make_mesh(data=cfg.data_parallel, mc=cfg.mc_parallel)
    print(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} devices")

    key = jax.random.PRNGKey(tc.seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    # synthesize a shard of the corpus per host (stands in for a sharded
    # data loader over a 1M-sequence corpus)
    data = jnp.asarray(make_dot_data(
        seed=tc.seed + jax.process_index(), num_seqs=cfg.num_seqs,
        T=cfg.T, image_width=cfg.image_width))
    N = cfg.num_seqs * jax.process_count()

    pgm_prior = lds.init_pgm_param(k1, cfg.d_latent)
    pgm_params = lds.init_pgm_param(k2, cfg.d_latent)
    net_params = (
        recognition.init_mlp_recognize(k3, cfg.image_width, cfg.hidden,
                                       cfg.d_latent),
        decoders.init_mlp_decode(k4, cfg.d_latent, cfg.hidden,
                                 cfg.image_width),
    )

    # tc.batch_size is the GLOBAL batch; each of the P processes feeds its
    # Bg/P host-local slice and the slices are assembled into one global
    # sharded array over the mesh's data axis (so the N/global_batch stats
    # scaling in the DP step counts each sequence exactly once).
    Bg = tc.batch_size
    P_ = jax.process_count()
    assert Bg % P_ == 0, f"global batch {Bg} not divisible by {P_} hosts"
    B_local = Bg // P_
    batch_sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data"))

    opt_init, train_step = make_dp_train_step(
        lds.run_inference, recognition.mlp_recognize, decoders.mlp_loglike,
        pgm_prior, N, mesh, Bg, num_samples=tc.num_samples,
        natgrad_scale=tc.natgrad_scale, pgm_step_size=tc.pgm_step_size,
        net_step_size=tc.net_step_size, net_optimizer=tc.net_optimizer,
        donate=False)
    opt_state = opt_init(pgm_params, net_params)

    def global_batch(local_slice):
        if P_ == 1:
            return local_slice
        return jax.make_array_from_process_local_data(
            batch_sharding, local_slice)

    writer = MetricsWriter(tc.metrics_path)
    num_batches = data.shape[0] // B_local
    hist = []
    p, n, s = pgm_params, net_params, opt_state
    step = 0
    t0 = time.perf_counter()
    # metrics fence the device; fetch them every metrics_every steps so
    # dispatches chain in between (same policy as train.loop.run -- a
    # per-step sync costs ~25 ms over a tunneled device, more than the
    # step itself)
    every = max(1, tc.metrics_every)
    for epoch in range(tc.num_epochs):
        for b in range(num_batches):
            batch = global_batch(data[b * B_local:(b + 1) * B_local])
            key, k = jax.random.split(key)
            p, n, s, e, terms = train_step(p, n, s, batch, k)
            hist.append(e)  # device scalar -- no host sync
            step += 1
            if step % every == 0:
                writer.write(step - 1, elbo=float(e),
                             **{kk: float(v) for kk, v in terms.items()})
    jax.block_until_ready(e)
    dt = time.perf_counter() - t0
    hist = [float(v) for v in jax.device_get(hist)]
    multihost.assert_replicated_consistent(p, mesh)
    writer.close()
    print(f"steps={len(hist)} first_elbo={hist[0]:.4f} "
          f"last_elbo={hist[-1]:.4f} "
          f"seqs/sec={len(hist) * Bg / dt:.1f}")
    return hist


if __name__ == "__main__":
    main()
