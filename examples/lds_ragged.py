"""LDS-SVAE on a VARIABLE-LENGTH corpus: length-bucketed ragged batches.

Greenfield vs the reference (upstream mattjj/svae trains on fixed-T dense
arrays). The TPU-native ragged story end to end:

  data/loader.ragged_epoch_batches  (shuffle -> sort by length -> bucket ->
      pad to a rounded boundary -> shuffle batch order)
  -> train/loop.make_train_step(ragged=True)
  -> models/lds.run_inference(lengths=)   (exact padded-batch semantics:
      pad frames carry no evidence, normalized dummy pad transitions,
      pad-free M-step stats)
  -> masked decoder loglike.

Padding waste and compile count are both bounded: every batch's padded T
is a multiple of ``pad_multiple``, so an epoch touches at most
``T / pad_multiple`` distinct XLA programs while padding stays tight.

    python examples/lds_ragged.py [--preset lds_ragged_smoke] ...
"""

import sys
import os
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from svae_tpu.config import parse_config
from svae_tpu.data import make_dot_data, loader
from svae_tpu.models import lds
from svae_tpu.nets import recognition, decoders
from svae_tpu.train import loop as loop_lib
from svae_tpu.train import experiment


def make_ragged_corpus(seed, num_seqs, T_min, T_max, image_width):
    """Variable-length 1D dot videos: each sequence is an INDEPENDENT
    bouncing-dot rollout (own initial position/velocity) whose length is
    uniform in [T_min, T_max]."""
    rng = np.random.RandomState(seed)
    seqs = []
    for i in range(num_seqs):
        t = int(rng.randint(T_min, T_max + 1))
        full = make_dot_data(num_seqs=1, T=t, image_width=image_width,
                             seed=seed + 1 + i)
        seqs.append(np.asarray(full[0], np.float32))
    return seqs


def main(argv=None):
    cfg = parse_config("lds_ragged", argv)
    tc = cfg.train
    key = jax.random.PRNGKey(tc.seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    seqs = make_ragged_corpus(tc.seed, cfg.num_seqs, cfg.T_min, cfg.T,
                              cfg.image_width)
    N = len(seqs)
    mean_T = float(np.mean([s.shape[0] for s in seqs]))

    pgm_prior = lds.init_pgm_param(k1, cfg.d_latent)
    pgm_params = lds.init_pgm_param(k2, cfg.d_latent)
    net_params = (
        recognition.init_mlp_recognize(k3, cfg.image_width, cfg.hidden,
                                       cfg.d_latent),
        decoders.init_mlp_decode(k4, cfg.d_latent, cfg.hidden,
                                 cfg.image_width),
    )

    run_inf = partial(lds.run_inference, backend=cfg.backend,
                      parallel=cfg.scan_chunks or False)
    opt_init, train_step = loop_lib.make_train_step(
        run_inf, recognition.mlp_recognize, decoders.mlp_loglike,
        pgm_prior, N, num_samples=tc.num_samples,
        natgrad_scale=tc.natgrad_scale, pgm_step_size=tc.pgm_step_size,
        net_step_size=tc.net_step_size, net_optimizer=tc.net_optimizer,
        donate=False, ragged=True)
    opt_state = opt_init(pgm_params, net_params)

    # group_by_shape: each bucket's batches emit consecutively so
    # TrainConfig.steps_per_dispatch > 1 groups same-shape batches into
    # one scanned dispatch (train/loop.run_loader; bit-exact vs per-step)
    base_loader = loader.make_loader(
        seqs, tc.batch_size, seed=tc.seed, pad_multiple=cfg.pad_multiple,
        prefetch=2, group_by_shape=tc.steps_per_dispatch > 1)
    shapes = set()

    def get_batches(epoch):
        for frames, lengths in base_loader(epoch):
            shapes.add(int(frames.shape[1]))
            yield frames, jnp.asarray(lengths)

    pgm_params, net_params, opt_state, hist = experiment.run_with_loader(
        tc, train_step, pgm_params, net_params, opt_state, get_batches)

    print(f"steps={len(hist)} first_elbo={hist[0]:.4f} "
          f"last_elbo={hist[-1]:.4f} mean_T={mean_T:.1f} "
          f"padded_shapes={sorted(shapes)}")
    return hist, sorted(shapes)


if __name__ == "__main__":
    main()
