"""GMM-SVAE on 2D pinwheel data (BASELINE config 1; reference:
experiments/gmm_svae_synth.py).

    python examples/gmm_pinwheel.py [--preset gmm_pinwheel_smoke]
                                    [--K 8] [--train.num_epochs 100] ...
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from svae_tpu.config import parse_config
from svae_tpu.data import make_pinwheel
from svae_tpu.models import gmm
from svae_tpu.nets import recognition, decoders
from svae_tpu.train import loop as loop_lib
from svae_tpu.train import experiment


def main(argv=None):
    cfg = parse_config("gmm_pinwheel", argv)
    tc = cfg.train
    key = jax.random.PRNGKey(tc.seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    data = jnp.asarray(make_pinwheel(
        seed=tc.seed, num_classes=cfg.num_classes,
        num_per_class=cfg.num_per_class))
    N, d_obs = data.shape

    pgm_prior = gmm.init_pgm_param(k1, cfg.K, cfg.d_latent)
    pgm_params = gmm.init_pgm_param(k2, cfg.K, cfg.d_latent,
                                    random_scale=2.0)
    net_params = (
        recognition.init_mlp_recognize(k3, d_obs, cfg.hidden, cfg.d_latent),
        decoders.init_mlp_decode(k4, cfg.d_latent, cfg.hidden, d_obs),
    )

    def run_inf(prior, glob, pots, key, S):
        return gmm.run_inference(prior, glob, pots, key, S,
                                 num_meanfield_iters=cfg.meanfield_iters)

    opt_init, train_step = loop_lib.make_train_step(
        run_inf, recognition.mlp_recognize, decoders.mlp_loglike,
        pgm_prior, N, num_samples=tc.num_samples,
        natgrad_scale=tc.natgrad_scale, pgm_step_size=tc.pgm_step_size,
        net_step_size=tc.net_step_size, net_optimizer=tc.net_optimizer,
        donate=False)
    opt_state = opt_init(pgm_params, net_params)

    snapshots = []
    extra_callback = None
    if tc.animate_path:
        import numpy as _np

        def extra_callback(step, elbo, state, terms):
            pgm, net, _ = state
            J, h = recognition.mlp_recognize(net[0], data)
            snapshots.append((_np.asarray(h / J),
                              jax.tree.map(_np.asarray, pgm), step))

    pgm_params, net_params, opt_state, hist = experiment.run(
        tc, train_step, pgm_params, net_params, opt_state, data,
        extra_callback=extra_callback)

    if tc.animate_path and snapshots:
        from svae_tpu.utils import plotting
        plotting.animate_gmm_clusters(tc.animate_path, snapshots)
        print(f"wrote {tc.animate_path} ({len(snapshots)} frames)")

    if tc.plot_path:
        from svae_tpu.utils import plotting
        import numpy as np
        # show clusters in the recognition net's latent space
        J, h = recognition.mlp_recognize(net_params[0], data)
        latents = np.asarray(h / J)
        plotting.plot_gmm_clusters(tc.plot_path, latents, pgm_params)

    if hist:
        print(f"steps={len(hist)} first_elbo={hist[0]:.4f} "
              f"last_elbo={hist[-1]:.4f}")
    else:
        print("steps=0 (already at the target epoch count)")
    return hist


if __name__ == "__main__":
    main()
