"""GMM-SVAE: Gaussian-mixture prior composed with a neural decoder.

(reference: svae/models/gmm.py -- run_inference / local_meanfield /
label_meanfield / gaussian_meanfield / init_pgm_param / prior_kl.)

Global natural parameters: ``(dirichlet_natparam (K,), niw_natparam)`` with
the NIW tuple batched over a leading K axis. The E-step is block mean-field
q(z) q(x): a fixed number of coordinate-ascent sweeps evaluated as a
``lax.scan`` (statically shaped, jit-compatible -- the reference's Python
``for`` loop with tolerance checks does not trace; SURVEY.md section 7 hard
part 4), batched over the whole minibatch at once so each sweep is a single
large einsum/softmax pair on the MXU rather than a per-point loop.

Gradient flow (replicates the reference's semantics, SURVEY.md section 3.4):
the sweep loop runs under ``stop_gradient`` (the fixed point is not
implicitly differentiated); one final differentiable update produces the
Gaussian factors, samples, stats and KLs, so reparameterization gradients
flow through the last iterate and the sampler only. Expected stats are
detached by the training core before the natural-gradient update.
"""

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from svae_tpu.expfam import gaussian, niw, dirichlet
from svae_tpu.utils.psd import f32_linalg
from svae_tpu.utils.pytree import tree_sub, tree_dot


# --------------------------------------------------------------------------
# global parameter init
# --------------------------------------------------------------------------


def init_pgm_param(key, K, d, alpha=1.0, niw_conc=10.0, random_scale=1.0,
                   dtype=jnp.float32):
    """Random global natparams: symmetric Dirichlet(alpha) on weights and K
    NIW factors whose mean locations are scattered (symmetry breaking --
    reference: svae/models/gmm.py:init_pgm_param)."""
    k1 = key
    alpha_vec = alpha * jnp.ones((K,), dtype)
    dir_natparam = dirichlet.standard_to_natural(alpha_vec)

    m = random_scale * jax.random.normal(k1, (K, d), dtype)
    kappa = niw_conc * jnp.ones((K,), dtype)
    nu = (d + niw_conc) * jnp.ones((K,), dtype)
    Phi = jnp.broadcast_to((nu[0]) * jnp.eye(d, dtype=dtype), (K, d, d))
    niw_natparam = niw.standard_to_natural(Phi, m, kappa, nu)
    return (dir_natparam, niw_natparam)


def pgm_expectedstats(global_natparam):
    """(E[log pi], NIW expected stats) under q(theta)."""
    dir_natparam, niw_natparam = global_natparam
    return (
        dirichlet.expectedstats(dir_natparam),
        niw.expectedstats(niw_natparam),
    )


# --------------------------------------------------------------------------
# mean-field E-step
# --------------------------------------------------------------------------


def _gaussian_meanfield(gauss_globals, node_natparam, label_probs):
    """q(x_n) natparam = sum_k r_nk E[eta_k] + psi_n (natural-coordinate
    addition; reference: svae/models/gmm.py:gaussian_meanfield)."""
    (E_eta1, E_eta2), _const = gauss_globals  # (K,d,d), (K,d)
    eta1_node, eta2_node = node_natparam  # (B,d,d), (B,d)
    eta1 = jnp.einsum("bk,kij->bij", label_probs, E_eta1) + eta1_node
    eta2 = jnp.einsum("bk,ki->bi", label_probs, E_eta2) + eta2_node
    return (eta1, eta2)


def _label_logits(e_logpi, gauss_globals, gauss_stats):
    """logit_nk = E[log pi_k] + <E[eta_k], s_n> + const_k."""
    (E_eta1, E_eta2), const = gauss_globals
    ExxT, Ex = gauss_stats
    quad = jnp.einsum("kij,bij->bk", E_eta1, ExxT)
    lin = jnp.einsum("ki,bi->bk", E_eta2, Ex)
    return e_logpi + quad + lin + const


@f32_linalg
def local_meanfield(global_natparam, nn_potentials, num_iters=25,
                    num_diff_iters=2):
    """Block coordinate ascent on q(z) q(x) for a minibatch.

    ``nn_potentials`` = (J_diag, h) diagonal evidence from the recognizer,
    shapes (B, d). The first ``num_iters - num_diff_iters`` sweeps run under
    ``stop_gradient`` (pure fixed-point iteration, O(1) backward memory);
    the last ``num_diff_iters`` sweeps are differentiated through, so the
    gradient is the truncated-backprop-through-the-fixed-point gradient --
    it converges to the exact (implicit) gradient geometrically in
    ``num_diff_iters`` because the sweep map is a contraction near the fixed
    point (tested by finite differences in tests/test_gmm.py; SURVEY.md 3.4).

    Returns ``(label_probs, gauss_natparam, gauss_stats, local_kl)``.
    """
    dir_natparam, niw_natparam = global_natparam
    e_logpi = dirichlet.expectedstats(dir_natparam)  # (K,)
    (E_eta1, E_eta2), const = niw.expected_gaussian_natparam(niw_natparam)
    gauss_globals = ((E_eta1, E_eta2), const)

    J_diag, h = nn_potentials
    node_natparam = gaussian.pack_dense(J_diag, h)
    B = h.shape[0]
    K = e_logpi.shape[0]

    def make_sweep(globals_, node_, e_logpi_):
        def sweep(label_probs, _):
            q_x = _gaussian_meanfield(globals_, node_, label_probs)
            stats = gaussian.expectedstats(q_x)
            logits = _label_logits(e_logpi_, globals_, stats)
            return jax.nn.softmax(logits, axis=-1), None

        return sweep

    # ---- stopped warmup sweeps (fixed point not differentiated, SURVEY 3.4)
    sg = jax.lax.stop_gradient
    num_diff = min(num_diff_iters, num_iters)
    r0 = jnp.full((B, K), 1.0 / K, h.dtype)
    warm = num_iters - num_diff
    if warm > 0:
        sweep_sg = make_sweep(*sg((gauss_globals, node_natparam, e_logpi)))
        r0, _ = jax.lax.scan(sweep_sg, r0, None, length=warm)
        r0 = sg(r0)

    # ---- differentiable tail sweeps ----
    if num_diff > 0:
        sweep = make_sweep(gauss_globals, node_natparam, e_logpi)
        label_probs, _ = jax.lax.scan(sweep, r0, None, length=num_diff)
    else:
        label_probs = r0

    # ---- one differentiable pass around the fixed point ----
    gauss_natparam = _gaussian_meanfield(gauss_globals, node_natparam,
                                         label_probs)
    gauss_stats = gaussian.expectedstats(gauss_natparam)
    logits = _label_logits(e_logpi, gauss_globals, gauss_stats)
    # label update is also refreshed differentiably (softmax of logits);
    # using it in the KL keeps first-order correctness at the fixed point.
    label_probs = jax.nn.softmax(logits, axis=-1)

    # local KL = E_q[log q(z)q(x) - log p(z, x | theta)] with expected
    # natparams; see derivation in module docstring of tests/test_gmm.py.
    #   sum_n <psi_n, s_n> - logZ(q_x_n) - logsumexp(logit_n)
    #         + sum_k r_nk <E_eta_k, s_n>   (stats pairing w/o const)
    ExxT, Ex = gauss_stats
    psi_term = jnp.einsum("bij,bij->b", node_natparam[0], ExxT) + jnp.einsum(
        "bi,bi->b", node_natparam[1], Ex
    )
    pair_term = jnp.einsum(
        "bk,bk->b",
        label_probs,
        jnp.einsum("kij,bij->bk", E_eta1, ExxT)
        + jnp.einsum("ki,bi->bk", E_eta2, Ex),
    )
    local_kl = jnp.sum(
        psi_term - gaussian.logZ(gauss_natparam) - logsumexp(logits, axis=-1)
        + pair_term
    )
    return label_probs, gauss_natparam, gauss_stats, local_kl


# --------------------------------------------------------------------------
# expected sufficient statistics for the natural gradient
# --------------------------------------------------------------------------


def _global_stats(label_probs, gauss_stats):
    """Stats congruent with (dirichlet natparam, niw natparam) so the
    conjugate update is pytree addition."""
    ExxT, Ex = gauss_stats
    dir_stats = jnp.sum(label_probs, axis=0)  # (K,)
    niw_s1 = jnp.einsum("bk,bij->kij", label_probs, ExxT)
    niw_s2 = jnp.einsum("bk,bi->ki", label_probs, Ex)
    niw_s3 = dir_stats
    niw_s4 = dir_stats
    return (dir_stats, (niw_s1, niw_s2, niw_s3, niw_s4))


def prior_kl(global_natparam, prior_natparam):
    """KL(q(theta) || p(theta)) for the conjugate globals
    (reference: svae/models/gmm.py:prior_kl)."""
    dir_q, niw_q = global_natparam
    dir_p, niw_p = prior_natparam
    dir_kl = (
        jnp.sum((dir_q - dir_p) * dirichlet.expectedstats(dir_q))
        - dirichlet.logZ(dir_q)
        + dirichlet.logZ(dir_p)
    )
    niw_stats = niw.expectedstats(niw_q)
    niw_kl = (
        tree_dot(tree_sub(niw_q, niw_p), niw_stats)
        - jnp.sum(niw.logZ(niw_q))
        + jnp.sum(niw.logZ(niw_p))
    )
    return dir_kl + niw_kl


# --------------------------------------------------------------------------
# the model contract
# --------------------------------------------------------------------------


@f32_linalg
def run_inference(prior_natparam, global_natparam, nn_potentials, key,
                  num_samples=1, num_meanfield_iters=25):
    """E-step + sampling + KLs (reference: svae/models/gmm.py:run_inference).

    Returns ``(samples, expected_stats, global_kl, local_kl)`` where
    ``samples`` has shape (num_samples, B, d) and ``expected_stats`` is
    congruent with ``global_natparam``.
    """
    label_probs, gauss_natparam, gauss_stats, local_kl = local_meanfield(
        global_natparam, nn_potentials, num_iters=num_meanfield_iters
    )
    samples = gaussian.natural_sample(gauss_natparam, key, num_samples)
    stats = _global_stats(label_probs, gauss_stats)
    global_kl = prior_kl(global_natparam, prior_natparam)
    return samples, stats, global_kl, local_kl


@f32_linalg
def classify(global_natparam, nn_potentials, num_meanfield_iters=25):
    """Posterior responsibilities q(z) for (new) data given trained
    globals -- the label field of the mean-field E-step (the quantity the
    reference's pinwheel animation colors by). Returns (B, K)."""
    label_probs, _, _, _ = local_meanfield(
        global_natparam, nn_potentials, num_iters=num_meanfield_iters)
    return label_probs
