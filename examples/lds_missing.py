"""LDS-SVAE with missing frames: train through the masked-evidence
pipeline on dot videos with a fraction of frames dropped, then impute the
dropped frames with the smoother and report pixel RMSE vs the held-back
truth (and vs a copy-last-observed baseline).

Greenfield vs the reference (upstream mattjj/svae assumes dense evidence);
exercises data/masking.nan_mask -> elbo.make_objective(mask_fn=) ->
models/lds.run_inference(mask=) -> masked decoder loglike end to end.

    python examples/lds_missing.py [--preset lds_missing_smoke]
        [--missing_frac 0.25] ...
"""

import sys
import os
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from svae_tpu.config import parse_config
from svae_tpu.data import make_dot_data
from svae_tpu.data import masking
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


def drop_frames(key, data, missing_frac):
    """NaN-mark a random ``missing_frac`` of the (seq, frame) pairs, always
    keeping each sequence's first frame observed (anchors the chain)."""
    N, T = data.shape[:2]
    u = jax.random.uniform(key, (N, T))
    drop = (u < missing_frac).at[:, 0].set(False)
    return jnp.where(drop[..., None], jnp.nan, data), drop


def impute(pgm_params, net_params, corrupted, clean_batch, mask):
    """Smoother-impute every frame, return per-frame reconstructions."""
    pots = recognition.mlp_recognize(net_params[0], clean_batch)
    Ex, _, _, _ = lds.posterior_moments(pgm_params, pots, mask=mask)
    recon, _ = decoders.mlp_decode(net_params[1], Ex)
    return recon


def main(argv=None):
    cfg = parse_config("lds_missing", argv)
    tc = cfg.train
    key = jax.random.PRNGKey(tc.seed)

    truth = jnp.asarray(make_dot_data(
        seed=tc.seed, num_seqs=cfg.num_seqs, T=cfg.T,
        image_width=cfg.image_width))
    data, dropped = drop_frames(jax.random.PRNGKey(tc.seed + 1), truth,
                                cfg.missing_frac)
    N = data.shape[0]
    print(f"dropped {float(dropped.mean()):.1%} of frames "
          f"({int(dropped.sum())} of {dropped.size})")

    pgm_prior, pgm_params, net_params = build(cfg, key)

    run_inf = partial(lds.run_inference, backend=cfg.backend,
                      parallel=cfg.scan_chunks or False)
    opt_init, train_step = loop_lib.make_train_step(
        run_inf, recognition.mlp_recognize, decoders.mlp_loglike,
        pgm_prior, N, num_samples=tc.num_samples,
        natgrad_scale=tc.natgrad_scale, pgm_step_size=tc.pgm_step_size,
        net_step_size=tc.net_step_size, net_optimizer=tc.net_optimizer,
        donate=False, mask_fn=masking.nan_mask)
    opt_state = opt_init(pgm_params, net_params)

    pgm_params, net_params, opt_state, hist = experiment.run(
        tc, train_step, pgm_params, net_params, opt_state, data)

    # ---- impute the dropped frames and score against the held-back truth
    eval_n = min(N, 64)
    clean, mask = masking.nan_mask(data[:eval_n])
    recon = impute(pgm_params, net_params, data[:eval_n], clean, mask)
    miss = np.asarray(dropped[:eval_n])
    truth_np = np.asarray(truth[:eval_n])
    rmse = float(np.sqrt(np.mean(
        (np.asarray(recon)[miss] - truth_np[miss]) ** 2)))

    # copy-last-observed baseline (per sequence, forward fill in pixels)
    filled = np.array(truth_np)
    for i in range(eval_n):
        for t in range(1, filled.shape[1]):
            if miss[i, t]:
                filled[i, t] = filled[i, t - 1]
    rmse_ffill = float(np.sqrt(np.mean(
        (filled[miss] - truth_np[miss]) ** 2)))
    print(f"imputation_rmse={rmse:.4f} ffill_baseline={rmse_ffill:.4f}")

    if tc.plot_path:
        from svae_tpu.utils import plotting
        plotting.plot_lds_reconstruction(
            tc.plot_path, truth_np[0], np.asarray(recon[0]))

    if hist:
        print(f"steps={len(hist)} first_elbo={hist[0]:.4f} "
              f"last_elbo={hist[-1]:.4f}")
    return rmse, rmse_ffill


if __name__ == "__main__":
    main()
