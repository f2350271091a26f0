"""SLDS-SVAE on synthetic switching-dynamics dot sequences (BASELINE
config 3): joint HMM forward-backward x per-state Kalman messages in the
structured mean-field E-step.

    python examples/slds_synth.py [--preset slds_synth_smoke] ...
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from svae_tpu.config import parse_config
from svae_tpu.models import slds
from svae_tpu.nets import recognition, decoders
from svae_tpu.train import loop as loop_lib
from svae_tpu.train import experiment


def make_switching_dot_data(seed, num_seqs, T, image_width,
                            return_states=False):
    """Dot sequences whose velocity regime switches on a Markov schedule --
    ground truth has genuinely switching linear dynamics. With
    ``return_states`` also returns the true regime path (num_seqs, T)
    int32 for segmentation scoring."""
    rng = np.random.RandomState(seed)
    xs = np.arange(image_width)
    out = np.empty((num_seqs, T, image_width), np.float32)
    states = np.empty((num_seqs, T), np.int32)
    speeds = [0.1, 0.6]
    for s in range(num_seqs):
        pos = rng.uniform(2, image_width - 2)
        regime = rng.randint(2)
        direction = rng.choice([-1.0, 1.0])
        for t in range(T):
            if rng.rand() < 0.05:
                regime = 1 - regime
            states[s, t] = regime
            pos += direction * speeds[regime]
            if pos < 1 or pos > image_width - 2:
                direction = -direction
                pos = np.clip(pos, 1, image_width - 2)
            out[s, t] = np.exp(-0.5 * ((xs - pos) / 1.5) ** 2)
    out += 0.05 * rng.randn(*out.shape)
    out = out.astype(np.float32)
    return (out, states) if return_states else out


def segmentation_purity(pred, true):
    """Map each predicted discrete state to its majority true regime and
    score the fraction of frames explained (label-permutation-invariant;
    the eval the reference's SLDS experiments did by eye)."""
    pred, true = np.asarray(pred).ravel(), np.asarray(true).ravel()
    correct = 0
    for k in np.unique(pred):
        m = pred == k
        correct += np.bincount(true[m]).max()
    return correct / pred.size


def main(argv=None):
    cfg = parse_config("slds_synth", argv)
    tc = cfg.train
    key = jax.random.PRNGKey(tc.seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    data_np, true_states = make_switching_dot_data(
        tc.seed, cfg.num_seqs, cfg.T, cfg.image_width, return_states=True)
    data = jnp.asarray(data_np)
    N = data.shape[0]

    pgm_prior = slds.init_pgm_param(k1, cfg.K, cfg.d_latent)
    pgm_params = slds.init_pgm_param(k2, cfg.K, cfg.d_latent)
    net_params = (
        recognition.init_mlp_recognize(k3, cfg.image_width, cfg.hidden,
                                       cfg.d_latent),
        decoders.init_mlp_decode(k4, cfg.d_latent, cfg.hidden,
                                 cfg.image_width),
    )

    def run_inf(prior, glob, pots, key, S):
        return slds.run_inference(
            prior, glob, pots, key, S,
            num_meanfield_iters=cfg.meanfield_iters, backend=cfg.backend)

    opt_init, train_step = loop_lib.make_train_step(
        run_inf, recognition.mlp_recognize, decoders.mlp_loglike,
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

    # MAP segmentation of a held-out-ish probe batch vs the true regimes
    n_probe = min(8, N)
    pots = recognition.mlp_recognize(net_params[0], data[:n_probe])
    decode = jax.jit(jax.vmap(lambda p: slds.most_likely_states(
        pgm_params, p, num_meanfield_iters=cfg.meanfield_iters)))
    paths = decode(pots)
    purity = segmentation_purity(paths, true_states[:n_probe])
    print(f"segmentation_purity={purity:.3f} (K={cfg.K} states vs 2 true "
          f"regimes, {n_probe} seqs)")
    if tc.plot_path:
        from svae_tpu.utils import plotting
        plotting.plot_slds_segmentation(tc.plot_path, paths,
                                        true_states[:n_probe])
    return hist


if __name__ == "__main__":
    main()
