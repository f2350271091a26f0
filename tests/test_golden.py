"""Golden-trajectory regression tests (SURVEY.md section 4 "implication
for the rebuild"): short fixed-seed training runs whose ELBO trajectories
are pinned to recorded values. Guards silent objective/gradient changes --
any intentional change to the math must update these numbers consciously.

Recorded on CPU/f64 (conftest forces both), jax 0.9.0, 2026-08-17.
"""

import jax
import jax.numpy as jnp
import numpy as np

from svae_tpu.data import make_pinwheel, make_dot_data
from svae_tpu.models import gmm, lds
from svae_tpu.nets import recognition, decoders
from svae_tpu.train import loop as loop_lib

# Updated when the objective changes intentionally. Tolerance is loose
# enough for BLAS reduction-order jitter, tight enough to catch any real
# change in the objective (which shifts trajectories at the 1e-2 level).
GMM_GOLDEN_FIRST = -8.494636231915711
GMM_GOLDEN_LAST = -5.5927350399851585
LDS_GOLDEN_FIRST = -258.7591035822472
LDS_GOLDEN_LAST = -175.8143807257222
RTOL = 1e-6


def _gmm_run():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    data = jnp.asarray(make_pinwheel(seed=1, num_per_class=20), jnp.float64)
    N = data.shape[0]
    prior = gmm.init_pgm_param(k1, 6, 2, dtype=jnp.float64)
    params = gmm.init_pgm_param(k2, 6, 2, random_scale=2.0,
                                dtype=jnp.float64)
    ka, kb = jax.random.split(k3)
    net = (recognition.init_mlp_recognize(ka, 2, (20,), 2,
                                          dtype=jnp.float64),
           decoders.init_mlp_decode(kb, 2, (20,), 2, dtype=jnp.float64))

    def run_inf(prior, glob, pots, key, S):
        return gmm.run_inference(prior, glob, pots, key, S,
                                 num_meanfield_iters=15)

    opt_init, step = loop_lib.make_train_step(
        run_inf, recognition.mlp_recognize, decoders.mlp_loglike, prior, N,
        num_samples=2, pgm_step_size=0.5, net_step_size=1e-2, donate=False)
    s = opt_init(params, net)
    _, _, _, hist, _ = loop_lib.run(step, params, net, s, data,
                                 jax.random.PRNGKey(7), 4, 50,
                                 shuffle=False)
    return hist


def _lds_run():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    data = jnp.asarray(make_dot_data(seed=1, num_seqs=16, T=20,
                                     image_width=10), jnp.float64)
    N = data.shape[0]
    prior = lds.init_pgm_param(k1, 3, dtype=jnp.float64)
    params = lds.init_pgm_param(k2, 3, dtype=jnp.float64)
    ka, kb = jax.random.split(k3)
    net = (recognition.init_mlp_recognize(ka, 10, (20,), 3,
                                          dtype=jnp.float64),
           decoders.init_mlp_decode(kb, 3, (20,), 10, dtype=jnp.float64))
    opt_init, step = loop_lib.make_train_step(
        lds.run_inference, recognition.mlp_recognize, decoders.mlp_loglike,
        prior, N, num_samples=2, pgm_step_size=0.5, net_step_size=1e-2,
        donate=False)
    s = opt_init(params, net)
    _, _, _, hist, _ = loop_lib.run(step, params, net, s, data,
                                 jax.random.PRNGKey(7), 4, 8,
                                 shuffle=False)
    return hist


def test_gmm_golden_trajectory():
    hist = _gmm_run()
    np.testing.assert_allclose(hist[0], GMM_GOLDEN_FIRST, rtol=RTOL)
    np.testing.assert_allclose(hist[-1], GMM_GOLDEN_LAST, rtol=RTOL)


def test_lds_golden_trajectory():
    hist = _lds_run()
    np.testing.assert_allclose(hist[0], LDS_GOLDEN_FIRST, rtol=RTOL)
    np.testing.assert_allclose(hist[-1], LDS_GOLDEN_LAST, rtol=RTOL)


if __name__ == "__main__":  # regenerate goldens
    g = _gmm_run()
    l = _lds_run()
    print(f"GMM_GOLDEN_FIRST = {g[0]!r}")
    print(f"GMM_GOLDEN_LAST = {g[-1]!r}")
    print(f"LDS_GOLDEN_FIRST = {l[0]!r}")
    print(f"LDS_GOLDEN_LAST = {l[-1]!r}")
