"""LDS-SVAE on 1D bouncing-dot image sequences, T=100 (BASELINE config 2;
reference: experiments/lds_svae_synth.py).

    python examples/lds_dots.py [--preset lds_dots_smoke] [--T 100] ...
"""

import sys
import os
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from svae_tpu.config import parse_config
from svae_tpu.data import make_dot_data
from svae_tpu.models import lds
from svae_tpu.nets import recognition, decoders
from svae_tpu.train import loop as loop_lib
from svae_tpu.train import experiment


def build(cfg, key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    pgm_prior = lds.init_pgm_param(k1, cfg.d_latent)
    pgm_params = lds.init_pgm_param(k2, cfg.d_latent)
    net_params = (
        recognition.init_mlp_recognize(k3, cfg.image_width, cfg.hidden,
                                       cfg.d_latent),
        decoders.init_mlp_decode(k4, cfg.d_latent, cfg.hidden,
                                 cfg.image_width),
    )
    return pgm_prior, pgm_params, net_params


def main(argv=None):
    cfg = parse_config("lds_dots", argv)
    tc = cfg.train
    key = jax.random.PRNGKey(tc.seed)

    data = jnp.asarray(make_dot_data(
        seed=tc.seed, num_seqs=cfg.num_seqs, T=cfg.T,
        image_width=cfg.image_width))
    N = data.shape[0]  # N counts sequences (the exchangeable unit)

    pgm_prior, pgm_params, net_params = build(cfg, key)

    run_inf = partial(lds.run_inference, backend=cfg.backend,
                      parallel=cfg.scan_chunks or False)
    opt_init, train_step = loop_lib.make_train_step(
        run_inf, recognition.mlp_recognize, decoders.mlp_loglike,
        pgm_prior, N, num_samples=tc.num_samples,
        natgrad_scale=tc.natgrad_scale, pgm_step_size=tc.pgm_step_size,
        net_step_size=tc.net_step_size, net_optimizer=tc.net_optimizer,
        donate=False)
    opt_state = opt_init(pgm_params, net_params)

    pgm_params, net_params, opt_state, hist = experiment.run(
        tc, train_step, pgm_params, net_params, opt_state, data)

    if tc.plot_path:
        import numpy as np
        from svae_tpu.utils import plotting
        seq = data[:1]
        pots = recognition.mlp_recognize(net_params[0], seq)
        samples, _, _, _ = lds.run_inference(
            pgm_prior, pgm_params, pots, jax.random.PRNGKey(0), 1)
        recon, _ = decoders.mlp_decode(net_params[1], samples[0, 0])
        plotting.plot_lds_reconstruction(tc.plot_path, np.asarray(seq[0]),
                                         np.asarray(recon))

    if hist:
        print(f"steps={len(hist)} first_elbo={hist[0]:.4f} "
              f"last_elbo={hist[-1]:.4f}")
    else:
        print("steps=0 (already at the target epoch count)")
    return hist


if __name__ == "__main__":
    main()
