"""LDS-SVAE on high-dim 2D image sequences with a conv recognition net,
T=500 (BASELINE config 4).

    python examples/conv_lds.py [--preset conv_lds_smoke] ...
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from svae_tpu.config import parse_config
from svae_tpu.models import lds
from svae_tpu.nets import recognition, decoders
from svae_tpu.train import loop as loop_lib
from svae_tpu.train import experiment


def make_2d_dot_movies(seed, num_seqs, T, hw):
    """A Gaussian blob bouncing around a 2D frame; frames flattened."""
    rng = np.random.RandomState(seed)
    H, W = hw
    ys, xs = np.mgrid[0:H, 0:W]
    out = np.empty((num_seqs, T, H * W), np.float32)
    for s in range(num_seqs):
        p = rng.uniform([1, 1], [H - 2, W - 2])
        v = 0.4 * rng.randn(2)
        for t in range(T):
            img = np.exp(-0.5 * (((ys - p[0]) ** 2 + (xs - p[1]) ** 2)
                                 / 1.5 ** 2))
            out[s, t] = img.ravel()
            p = p + v
            for i, lim in enumerate((H - 1, W - 1)):
                if p[i] < 0 or p[i] > lim:
                    v[i] = -v[i]
                    p[i] = np.clip(p[i], 0, lim)
    out += 0.03 * rng.randn(*out.shape)
    return out.astype(np.float32)


def main(argv=None):
    cfg = parse_config("conv_lds", argv)
    tc = cfg.train
    key = jax.random.PRNGKey(tc.seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    data = jnp.asarray(make_2d_dot_movies(
        tc.seed, cfg.num_seqs, cfg.T, cfg.frame_hw))
    N = data.shape[0]
    d_obs = data.shape[-1]

    pgm_prior = lds.init_pgm_param(k1, cfg.d_latent)
    pgm_params = lds.init_pgm_param(k2, cfg.d_latent)
    net_params = (
        recognition.init_conv_recognize(
            k3, cfg.frame_hw, cfg.channels, cfg.kernel_size, cfg.d_latent),
        decoders.init_mlp_decode(k4, cfg.d_latent, cfg.hidden_dec, d_obs),
    )

    from functools import partial
    run_inf = partial(lds.run_inference, backend=cfg.backend,
                      parallel=cfg.scan_chunks or False)
    cdt = (jnp.bfloat16 if cfg.net_compute_dtype == "bfloat16" else None)
    opt_init, train_step = loop_lib.make_train_step(
        run_inf, recognition.make_conv_recognize(cfg.frame_hw,
                                                 compute_dtype=cdt),
        decoders.make_mlp_loglike(compute_dtype=cdt),
        pgm_prior, N, num_samples=tc.num_samples,
        natgrad_scale=tc.natgrad_scale, pgm_step_size=tc.pgm_step_size,
        net_step_size=tc.net_step_size, net_optimizer=tc.net_optimizer,
        donate=False)
    opt_state = opt_init(pgm_params, net_params)

    pgm_params, net_params, opt_state, hist = experiment.run(
        tc, train_step, pgm_params, net_params, opt_state, data)

    if hist:
        print(f"steps={len(hist)} first_elbo={hist[0]:.4f} "
              f"last_elbo={hist[-1]:.4f}")
    else:
        print("steps=0 (already at the target epoch count)")

    if tc.plot_path:
        import numpy as np
        from svae_tpu.utils import plotting
        seq = data[:1]
        recog = recognition.make_conv_recognize(cfg.frame_hw)
        pots = recog(net_params[0], seq)
        samples, _, _, _ = lds.run_inference(
            pgm_prior, pgm_params, pots, jax.random.PRNGKey(1), 1,
            backend=cfg.backend)
        mu, _ = decoders.mlp_decode(net_params[1], samples[0, 0])
        plotting.plot_frame_montage(tc.plot_path, np.asarray(seq[0]),
                                    np.asarray(mu), cfg.frame_hw)
    return hist


if __name__ == "__main__":
    main()
