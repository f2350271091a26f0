"""SLDS-SVAE: switching linear dynamical system prior.

(reference: svae/models/slds.py -- structured mean-field q(z) q(x)
alternating HMM forward-backward with per-state expected Gaussian pair
energies and Kalman smoothing with state-averaged pair potentials;
SURVEY.md section 3.3.)

Generative model: discrete Markov chain z_{1:T} (K states; Dirichlet priors
on the initial distribution and each transition row), continuous chain
x_{1:T} with x_1 ~ NIW-governed Gaussian and
x_{t+1} | x_t, z_{t+1}=k ~ the k-th MNIW-governed linear-Gaussian dynamics.

Global natparams: ``(init_dir (K,), trans_dir (K,K), niw, mniw_K)`` with the
MNIW tuple batched over a leading K axis.

The local KL reduces to the clean form (derivation: because the HMM's
observation potentials L are linear in the q(x) pair stats with the same
coefficients as the averaged pair potentials, the cross pairings cancel)

  local_kl = <L, r> + <psi, x-stats> - logZ_hmm - logZ_lds

with r the HMM node marginals, psi the recognition potentials.

The mean-field loop runs stopped warmup sweeps + differentiable tail sweeps
(same truncated-backprop-at-the-fixed-point semantics as models/gmm.py; the
tail differentiates *through* hmm_marginals' internal grad, i.e.
second-order AD -- the stress test SURVEY.md 3.3 calls out).
"""

import jax
import jax.numpy as jnp

from svae_tpu.expfam import niw, mniw, dirichlet
from svae_tpu.ops import kalman, hmm
from svae_tpu.models import lds as lds_model
from svae_tpu.utils.psd import f32_linalg
from svae_tpu.utils.pytree import tree_sub, tree_dot


# --------------------------------------------------------------------------
# global parameter init
# --------------------------------------------------------------------------


def init_pgm_param(key, K, d, alpha=1.0, kappa_sticky=5.0, niw_conc=10.0,
                   mniw_conc=10.0, A_scale=0.9, Q_scale=0.1,
                   dtype=jnp.float32):
    """Random globals: sticky transition Dirichlet (diagonal boost
    ``kappa_sticky``), shared init NIW, K MNIW dynamics factors centered at
    distinct random rotations (symmetry breaking)."""
    keys = jax.random.split(key, K + 1)
    init_dir = dirichlet.standard_to_natural(alpha * jnp.ones((K,), dtype))
    trans_alpha = alpha * jnp.ones((K, K), dtype) + kappa_sticky * jnp.eye(
        K, dtype=dtype
    )
    trans_dir = dirichlet.standard_to_natural(trans_alpha)

    niw_np = lds_model.init_pgm_param(keys[0], d, niw_conc=niw_conc,
                                      dtype=dtype)[0]

    def one_mniw(k):
        _, mn = lds_model.init_pgm_param(k, d, mniw_conc=mniw_conc,
                                         A_scale=A_scale, Q_scale=Q_scale,
                                         dtype=dtype)
        return mn

    mniw_np = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[one_mniw(k) for k in keys[1:]]
    )
    return (init_dir, trans_dir, niw_np, mniw_np)


def pgm_expectedstats(global_natparam):
    init_dir, trans_dir, niw_np, mniw_np = global_natparam
    return (
        dirichlet.expectedstats(init_dir),
        dirichlet.expectedstats(trans_dir),
        niw.expectedstats(niw_np),
        mniw.expectedstats(mniw_np),
    )


# --------------------------------------------------------------------------
# structured mean-field E-step (single sequence)
# --------------------------------------------------------------------------


def _pair_energies(E_pair, x_pair_stats):
    """L[t, k] = expected log-density of transition t under dynamics k,
    evaluated at q(x)'s pair stats. Returns (T-1, K)."""
    E1, E2, E3, const = E_pair  # (K,d,d), (K,d,d), (K,d,d), (K,)
    ExxT_next, ExnT, ExxT_prev = x_pair_stats  # (T-1,d,d) each
    return (
        jnp.einsum("kij,tij->tk", E1, ExxT_next)
        + jnp.einsum("kij,tij->tk", E2, ExnT)
        + jnp.einsum("kij,tij->tk", E3, ExxT_prev)
        + const
    )


def _averaged_pairs(E_pair, r_next):
    """State-averaged pair potentials: Pbar_t = sum_k r_{t+1,k} E_k.
    ``r_next`` is (T-1, K)."""
    E1, E2, E3, const = E_pair
    P1 = jnp.einsum("tk,kij->tij", r_next, E1)
    P2 = jnp.einsum("tk,kij->tij", r_next, E2)
    P3 = jnp.einsum("tk,kij->tij", r_next, E3)
    Pc = r_next @ const
    return (P1, P2, P3, Pc)


def _x_pair_stats(Ex, ExxT, Exnxt):
    """(E[x'x'^T], E[x'x^T], E[xx^T]) per transition, from smoother output
    (Exnxt[t] = E[x_t x_{t+1}^T])."""
    return (ExxT[1:], jnp.swapaxes(Exnxt, -1, -2), ExxT[:-1])


@f32_linalg
def local_meanfield(global_natparam, nn_potentials, num_iters=15,
                    num_diff_iters=1, parallel=False, pair_weight=None):
    """Structured mean-field for one sequence.

    ``nn_potentials`` = (J_diag, h), each (T, d). Returns
    ``(hmm_post, lds_post, local_kl)`` where
    ``hmm_post = (logZ_hmm, r (T,K), trans_pair_stats, r1)`` and
    ``lds_post = (logZ_lds, (init, pairs, nodes), (Ex, ExxT, Exnxt))``.

    ``pair_weight`` (T-1,) {0,1} marks real transitions for a ragged
    sequence padded to T: pad transitions get the normalized dummy factors
    (N(0,I) on the continuous chain, uniform rows on the discrete chain),
    pad energies are zeroed, and pad pair counts are excluded -- so the
    padded chain reproduces the unpadded posterior / logZ / KL exactly
    (see lds.dummy_blend_pairs for why dummies instead of zero evidence).
    """
    init_dir, trans_dir, niw_np, mniw_np = global_natparam
    e_pi0 = dirichlet.expectedstats(init_dir)  # (K,)
    e_Pi = dirichlet.expectedstats(trans_dir)  # (K,K)
    (I1, I2), Ic = niw.expected_gaussian_natparam(niw_np)
    E_pair = mniw.expected_pair_potential(mniw_np)  # K-batched

    J_diag, h = nn_potentials
    T = h.shape[0]
    K = e_pi0.shape[0]
    nodes = lds_model._node_potentials((J_diag, h))
    chain_init = (I1, I2, Ic)

    def x_step(r_next, params):
        e_pair, ci, nds = params
        pairs = _averaged_pairs(e_pair, r_next)
        if pair_weight is not None:
            pairs = lds_model.dummy_blend_pairs(pairs, pair_weight)
        logZ_x, Ex, ExxT, Exnxt = kalman.lds_smoother(ci, pairs, nds,
                                                      parallel=parallel)
        return logZ_x, pairs, (Ex, ExxT, Exnxt)

    def z_step(xps, params):
        e_pair, epi0, ePi = params
        L = _pair_energies(e_pair, xps)  # (T-1, K)
        lt = ePi
        if pair_weight is not None:
            L = L * pair_weight[:, None]
            # normalized uniform dummy rows at pad transitions: each pad
            # step adds exactly 0 to logZ and constant betas, so real-frame
            # marginals match the truncated chain exactly
            w = pair_weight[:, None, None]
            lt = w * ePi[None] + (1.0 - w) * (-jnp.log(
                jnp.asarray(K, L.dtype)))
        log_obs = jnp.concatenate([jnp.zeros((1, K), L.dtype), L], axis=0)
        logZ_z, r, pair_marg, r1 = hmm.hmm_posterior(
            epi0, lt, log_obs, parallel=parallel, pair_weights=pair_weight)
        return logZ_z, L, r, pair_marg, r1

    def sweep(r, params):
        (e_pair, ci, nds, epi0, ePi) = params
        _, _, (Ex, ExxT, Exnxt) = x_step(r[1:], (e_pair, ci, nds))
        _, _, r_new, _, _ = z_step(_x_pair_stats(Ex, ExxT, Exnxt),
                                   (e_pair, epi0, ePi))
        return r_new

    sg = jax.lax.stop_gradient
    num_diff = min(num_diff_iters, num_iters)
    warm = num_iters - num_diff
    r0 = jnp.full((T, K), 1.0 / K, h.dtype)
    params = (E_pair, chain_init, nodes, e_pi0, e_Pi)
    if warm > 0:
        params_sg = sg(params)
        r0, _ = jax.lax.scan(
            lambda r, _: (sweep(r, params_sg), None), r0, None, length=warm
        )
        r0 = sg(r0)
    r = r0
    for _ in range(num_diff):  # differentiable tail (unrolled: few iters)
        r = sweep(r, params)

    # final differentiable half-sweeps for the posterior factors used by
    # stats / sampling / KL
    logZ_x, pairs_bar, (Ex, ExxT, Exnxt) = x_step(r[1:],
                                                  (E_pair, chain_init, nodes))
    xps = _x_pair_stats(Ex, ExxT, Exnxt)
    logZ_z, L, r, trans_pair_stats, r1 = z_step(xps, (E_pair, e_pi0, e_Pi))

    N1, N2 = nodes
    psi_term = jnp.sum(N1 * ExxT) + jnp.sum(N2 * Ex)
    Lr_term = jnp.sum(r[1:] * L)
    local_kl = Lr_term + psi_term - logZ_z - logZ_x

    hmm_post = (logZ_z, r, trans_pair_stats, r1)
    lds_post = (logZ_x, (chain_init, pairs_bar, nodes), (Ex, ExxT, Exnxt))
    return hmm_post, lds_post, local_kl


# --------------------------------------------------------------------------
# batched fused-kernel mean-field (backend="pallas")
# --------------------------------------------------------------------------


def _pair_energies_b(E_pair, x_pair_stats):
    """Batched ``_pair_energies``: (B, T-1, K)."""
    E1, E2, E3, const = E_pair
    ExxT_next, ExnT, ExxT_prev = x_pair_stats  # (B, T-1, d, d)
    return (
        jnp.einsum("kij,btij->btk", E1, ExxT_next)
        + jnp.einsum("kij,btij->btk", E2, ExnT)
        + jnp.einsum("kij,btij->btk", E3, ExxT_prev)
        + const
    )


def _averaged_pairs_b(E_pair, r_next):
    """Batched state-averaged pair potentials -- the per-sequence
    ("bpairs") layout the fused kernels consume natively. ``r_next`` is
    (B, T-1, K)."""
    E1, E2, E3, const = E_pair
    P1 = jnp.einsum("btk,kij->btij", r_next, E1)
    P2 = jnp.einsum("btk,kij->btij", r_next, E2)
    P3 = jnp.einsum("btk,kij->btij", r_next, E3)
    Pc = r_next @ const
    return (P1, P2, P3, Pc)


def _x_pair_stats_b(Ex, ExxT, Exnxt):
    return (ExxT[:, 1:], jnp.swapaxes(Exnxt, -1, -2), ExxT[:, :-1])


@f32_linalg
def _batched_meanfield_pallas(global_natparam, nn_potentials, num_iters=15,
                              num_diff_iters=1, interpret=False,
                              pair_weights=None):
    """Structured mean-field for a MINIBATCH on the differentiable fused
    Pallas kernels (svae_tpu/ops/pallas_vjp.py): the Kalman sweeps run
    with per-sequence state-averaged pair potentials streamed through the
    bpairs kernel layout; the HMM sweeps stay vmapped XLA (K is small).
    Same semantics as ``local_meanfield`` vmapped (parity-tested).
    ``pair_weights`` (B, T-1) marks real transitions for ragged batches
    (see local_meanfield; the kernels themselves are mask-free -- dummies
    ride the bpairs layout, stats are weighted at assembly)."""
    from svae_tpu.ops import pallas_vjp, pallas_hmm

    init_dir, trans_dir, niw_np, mniw_np = global_natparam
    e_pi0 = dirichlet.expectedstats(init_dir)
    e_Pi = dirichlet.expectedstats(trans_dir)
    (I1, I2), Ic = niw.expected_gaussian_natparam(niw_np)
    E_pair = mniw.expected_pair_potential(mniw_np)

    J_diag, h = nn_potentials  # (B, T, d), (B, T, d)
    B, T = h.shape[0], h.shape[1]
    K = e_pi0.shape[0]
    N1 = -0.5 * jnp.vectorize(jnp.diag, signature="(d)->(d,d)")(J_diag)
    nodes = (N1, h)
    chain_init = (I1, I2, Ic)

    def x_step(r_next, params):
        e_pair, ci, nds = params
        pairs = _averaged_pairs_b(e_pair, r_next)
        if pair_weights is not None:
            pairs = lds_model.dummy_blend_pairs(pairs, pair_weights)
        logZ_x, Jf, hf, Jb, hb = pallas_vjp.fb_pass(
            ci, pairs, nds, interpret=interpret)
        Ex, ExxT, Exnxt = pallas_vjp._smoother_assembly(
            pairs, nds, Jf, hf, Jb, hb)
        return logZ_x, pairs, (Ex, ExxT, Exnxt), (Jf, hf)

    def z_step(xps, params):
        e_pair, epi0, ePi = params
        L = _pair_energies_b(e_pair, xps)  # (B, T-1, K)
        lt = ePi
        if pair_weights is not None:
            L = L * pair_weights[..., None]
            w = pair_weights[..., None, None]
            lt = w * ePi[None, None] + (1.0 - w) * (-jnp.log(
                jnp.asarray(K, L.dtype)))  # (B, T-1, K, K)
        log_obs = jnp.concatenate(
            [jnp.zeros((B, 1, K), L.dtype), L], axis=1)
        logZ_z, r, pair_marg, r1 = pallas_hmm.hmm_posterior(
            epi0, lt, log_obs, interpret=interpret,
            pair_weights=pair_weights)
        return logZ_z, L, r, pair_marg, r1

    def sweep(r, params):
        (e_pair, ci, nds, epi0, ePi) = params
        _, _, (Ex, ExxT, Exnxt), _ = x_step(r[:, 1:], (e_pair, ci, nds))
        _, _, r_new, _, _ = z_step(_x_pair_stats_b(Ex, ExxT, Exnxt),
                                   (e_pair, epi0, ePi))
        return r_new

    sg = jax.lax.stop_gradient
    num_diff = min(num_diff_iters, num_iters)
    warm = num_iters - num_diff
    r0 = jnp.full((B, T, K), 1.0 / K, h.dtype)
    params = (E_pair, chain_init, nodes, e_pi0, e_Pi)
    if warm > 0:
        params_sg = sg(params)
        r0, _ = jax.lax.scan(
            lambda r, _: (sweep(r, params_sg), None), r0, None, length=warm
        )
        r0 = sg(r0)
    r = r0
    for _ in range(num_diff):
        r = sweep(r, params)

    logZ_x, pairs_bar, (Ex, ExxT, Exnxt), filt = x_step(
        r[:, 1:], (E_pair, chain_init, nodes))
    xps = _x_pair_stats_b(Ex, ExxT, Exnxt)
    logZ_z, L, r, trans_pair_stats, r1 = z_step(xps, (E_pair, e_pi0, e_Pi))

    psi_term = jnp.sum(N1 * ExxT) + jnp.sum(h * Ex)
    Lr_term = jnp.sum(r[:, 1:] * L)
    local_kl = Lr_term + psi_term - jnp.sum(logZ_z) - jnp.sum(logZ_x)

    hmm_post = (logZ_z, r, trans_pair_stats, r1)
    lds_post = (logZ_x, (chain_init, pairs_bar, nodes), (Ex, ExxT, Exnxt),
                filt)
    return hmm_post, lds_post, local_kl


def _batched_inference_pallas(global_natparam, nn_potentials, key,
                              num_samples, num_iters, num_diff_iters,
                              interpret=False, pair_weights=None):
    from svae_tpu.ops import pallas_vjp

    hmm_post, lds_post, local_kl = _batched_meanfield_pallas(
        global_natparam, nn_potentials, num_iters, num_diff_iters,
        interpret=interpret, pair_weights=pair_weights)
    _, r, trans_pair_stats, r1 = hmm_post
    _, (ci, pairs_bar, nodes), (Ex, ExxT, Exnxt), filt = lds_post
    samples = pallas_vjp.lds_sample(ci, pairs_bar, nodes, key, num_samples,
                                    interpret=interpret, filtered=filt)

    one = jnp.ones((), Ex.dtype)
    r_next = r[:, 1:]  # (B, T-1, K)
    if pair_weights is not None:
        # pad transitions leave the MNIW stats/counts (pad r is uniform
        # under the dummy factors and means nothing)
        r_next = r_next * pair_weights[..., None]
    ExnT = jnp.swapaxes(Exnxt, -1, -2)
    stats = (
        jnp.sum(r1, axis=0),
        jnp.sum(trans_pair_stats, axis=0),
        (jnp.sum(ExxT[:, 0], axis=0), jnp.sum(Ex[:, 0], axis=0),
         Ex.shape[0] * one, Ex.shape[0] * one),
        (
            jnp.einsum("btk,btij->kij", r_next, ExxT[:, 1:]),
            jnp.einsum("btk,btij->kij", r_next, ExnT),
            jnp.einsum("btk,btij->kij", r_next, ExxT[:, :-1]),
            jnp.sum(r_next, axis=(0, 1)),
        ),
    )
    return samples, stats, local_kl


# --------------------------------------------------------------------------
# stats / KL / contract
# --------------------------------------------------------------------------


def _sequence_stats(r, trans_pair_stats, r1, Ex, ExxT, Exnxt,
                    pair_weight=None):
    """Stats congruent with (init_dir, trans_dir, niw, mniw_K)."""
    one = jnp.ones((), Ex.dtype)
    init_dir_stats = r1
    trans_dir_stats = trans_pair_stats  # summed over t by hmm_marginals
    niw_stats = (ExxT[0], Ex[0], one, one)
    r_next = r[1:]  # (T-1, K)
    if pair_weight is not None:
        r_next = r_next * pair_weight[:, None]
    ExnT = jnp.swapaxes(Exnxt, -1, -2)
    mniw_stats = (
        jnp.einsum("tk,tij->kij", r_next, ExxT[1:]),
        jnp.einsum("tk,tij->kij", r_next, ExnT),
        jnp.einsum("tk,tij->kij", r_next, ExxT[:-1]),
        jnp.sum(r_next, axis=0),
    )
    return (init_dir_stats, trans_dir_stats, niw_stats, mniw_stats)


def prior_kl(global_natparam, prior_natparam):
    """KL(q(theta) || p(theta)) over all four conjugate factors."""
    iq, tq, nq, mq = global_natparam
    ip, tp, np_, mp = prior_natparam

    def dir_kl(q, p):
        return (
            jnp.sum((q - p) * dirichlet.expectedstats(q))
            - dirichlet.logZ(q)
            + dirichlet.logZ(p)
        )

    niw_kl = (
        tree_dot(tree_sub(nq, np_), niw.expectedstats(nq))
        - jnp.sum(niw.logZ(nq))
        + jnp.sum(niw.logZ(np_))
    )
    mniw_kl = (
        tree_dot(tree_sub(mq, mp), mniw.expectedstats(mq))
        - jnp.sum(mniw.logZ(mq))
        + jnp.sum(mniw.logZ(mp))
    )
    return dir_kl(iq, ip) + dir_kl(tq, tp) + niw_kl + mniw_kl


def _sequence_inference(global_natparam, nn_potentials, key, num_samples,
                        num_iters, num_diff_iters, parallel=False,
                        pair_weight=None):
    hmm_post, lds_post, local_kl = local_meanfield(
        global_natparam, nn_potentials, num_iters, num_diff_iters,
        parallel=parallel, pair_weight=pair_weight
    )
    _, r, trans_pair_stats, r1 = hmm_post
    _, (ci, pairs_bar, nodes), (Ex, ExxT, Exnxt) = lds_post
    samples = kalman.lds_sample(ci, pairs_bar, nodes, key, num_samples,
                                parallel=parallel)
    stats = _sequence_stats(r, trans_pair_stats, r1, Ex, ExxT, Exnxt,
                            pair_weight=pair_weight)
    return samples, stats, local_kl


def _z_chain_inputs(global_natparam, moments):
    """``(e_pi0, e_Pi, log_obs)`` of the discrete chain under the
    converged mean-field: the state-averaged Gaussian pair energies
    evaluated at q(x)'s ``moments`` = (Ex, ExxT, Exnxt) become the HMM
    observation potentials (shared by sample_states / most_likely_states /
    predict)."""
    init_dir, trans_dir, _, mniw_np = global_natparam
    e_pi0 = dirichlet.expectedstats(init_dir)
    e_Pi = dirichlet.expectedstats(trans_dir)
    E_pair = mniw.expected_pair_potential(mniw_np)
    Ex, ExxT, Exnxt = moments
    L = _pair_energies(E_pair, _x_pair_stats(Ex, ExxT, Exnxt))
    K = e_pi0.shape[0]
    log_obs = jnp.concatenate([jnp.zeros((1, K), L.dtype), L], axis=0)
    return e_pi0, e_Pi, log_obs


@f32_linalg
def sample_states(global_natparam, nn_potentials, key, num_samples=(),
                  num_meanfield_iters=15, parallel=False, mask=None):
    """Posterior samples of the DISCRETE chain z_{1:T} under the converged
    structured mean-field q(z) (Gumbel-argmax backward sampling through the
    HMM factor). Returns int32 paths shaped num_samples + (T,).
    ``mask`` marks missing frames (evidence zeroed, as in run_inference).
    """
    if mask is not None:
        nn_potentials = lds_model.mask_potentials(nn_potentials, mask)
    _, lds_post, _ = local_meanfield(
        global_natparam, nn_potentials, num_iters=num_meanfield_iters,
        num_diff_iters=0, parallel=parallel)
    e_pi0, e_Pi, log_obs = _z_chain_inputs(global_natparam, lds_post[2])
    return hmm.hmm_sample(e_pi0, e_Pi, log_obs, key, num_samples,
                          parallel=parallel)


@f32_linalg
def most_likely_states(global_natparam, nn_potentials,
                       num_meanfield_iters=15, parallel=False, mask=None):
    """MAP discrete-state path under the converged structured mean-field
    q(z) (Viterbi decode of the HMM factor with the state-averaged Gaussian
    pair energies as observations) -- the eval-side segmentation API
    (reference: the SLDS experiments' state-sequence plots). Returns an
    int32 path (T,); ``vmap`` for a batch. ``mask`` marks missing frames
    (evidence zeroed; segmentation bridges them through the dynamics)."""
    if mask is not None:
        nn_potentials = lds_model.mask_potentials(nn_potentials, mask)
    _, lds_post, _ = local_meanfield(
        global_natparam, nn_potentials, num_iters=num_meanfield_iters,
        num_diff_iters=0, parallel=parallel)
    e_pi0, e_Pi, log_obs = _z_chain_inputs(global_natparam, lds_post[2])
    path, _ = hmm.hmm_viterbi(e_pi0, e_Pi, log_obs, parallel=parallel)
    return path


@f32_linalg
def predict(global_natparam, nn_potentials, key, num_steps, num_samples=1,
            num_meanfield_iters=15, parallel=False, mask=None):
    """Regime-switching forecast: condition on an observed prefix via the
    structured mean-field, sample joint posterior paths (z_{1:T}, x_{1:T}),
    then roll the posterior-mean dynamics forward ``num_steps`` with
    discrete-state switching and process noise (reference: the SLDS
    experiments' prediction rollouts; the switching analogue of
    models.lds.predict).

    Forecast dynamics: z_{t+1} ~ Cat(E[Pi]_{z_t, .}) (posterior-mean
    transition rows from the Dirichlet factors),
    x_{t+1} ~ N(E[A_k] x_t, E[Sigma_k]) at k = z_{t+1}
    (mniw.posterior_mean_params -- the same single source of truth the LDS
    forecaster uses).

    Returns ``(x_traj, z_traj)`` shaped (S, T+num_steps, d) and int32
    (S, T+num_steps) -- with a leading batch axis if ``nn_potentials`` is
    batched. ``mask`` marks missing frames in the conditioning window (as
    in run_inference).
    """
    from svae_tpu.utils import smallchol

    init_dir, trans_dir, niw_np, mniw_np = global_natparam
    # posterior-MEAN transition probabilities (not exp E[log Pi]): the
    # forecast rollout wants a normalized predictive kernel
    alpha = dirichlet.natural_to_standard(trans_dir)
    log_Pi = jnp.log(alpha / jnp.sum(alpha, axis=-1, keepdims=True))
    A_k, Sigma_k = mniw.posterior_mean_params(mniw_np)  # (K,d,d) each
    d = A_k.shape[-1]
    Ls_k = smallchol.chol(Sigma_k)

    J_diag, h = nn_potentials
    if mask is not None:
        J_diag, h = lds_model.mask_potentials((J_diag, h), mask)
    batched = J_diag.ndim == 3

    if isinstance(num_samples, int):
        S = (num_samples,)
    else:
        S = tuple(num_samples)

    def one(p, k):
        _, lds_post, _ = local_meanfield(
            global_natparam, p, num_iters=num_meanfield_iters,
            num_diff_iters=0, parallel=parallel)
        _, (ci, pairs_bar, nodes), moments = lds_post
        k1, k2, k3, k4 = jax.random.split(k, 4)
        xs = kalman.lds_sample(ci, pairs_bar, nodes, k1, S,
                               parallel=parallel)  # S + (T, d)
        # discrete posterior paths under the converged mean-field energies
        e_pi0, e_Pi, log_obs = _z_chain_inputs(global_natparam, moments)
        K = e_pi0.shape[0]
        zs = hmm.hmm_sample(e_pi0, e_Pi, log_obs, k2, S,
                            parallel=parallel)  # S + (T,) int32

        eps = jax.random.normal(k3, (num_steps,) + S + (d,), xs.dtype)
        gum = jax.random.gumbel(k4, (num_steps,) + S + (K,), xs.dtype)

        def roll(carry, inp):
            z, x = carry
            g, e = inp
            z_next = jnp.argmax(log_Pi[z] + g, axis=-1)
            A = A_k[z_next]
            Ls = Ls_k[z_next]
            x_next = (A @ x[..., None])[..., 0] + (Ls @ e[..., None])[..., 0]
            return (z_next, x_next), (z_next, x_next)

        (_, _), (z_fut, x_fut) = jax.lax.scan(
            roll, (zs[..., -1], xs[..., -1, :]), (gum, eps))
        x_traj = jnp.concatenate(
            [xs, jnp.moveaxis(x_fut, 0, -2)], axis=-2)
        z_traj = jnp.concatenate(
            [zs, jnp.moveaxis(z_fut, 0, -1)], axis=-1).astype(jnp.int32)
        return x_traj, z_traj

    if batched:
        B = J_diag.shape[0]
        keys = jax.random.split(key, B)
        return jax.vmap(one)((J_diag, h), keys)
    return one((J_diag, h), key)


def run_inference(prior_natparam, global_natparam, nn_potentials, key,
                  num_samples=1, num_meanfield_iters=15, num_diff_iters=1,
                  parallel=False, backend="xla", interpret=False, mask=None,
                  lengths=None):
    """E-step + sampling + KLs (reference: svae/models/slds.py:run_inference).

    ``nn_potentials`` = (J_diag, h), each (T, d) or (B, T, d). Returns
    (samples, stats, global_kl, local_kl); samples are continuous latents
    x ~ q(x), shaped (S, T, d) or (S, B, T, d) -- sample axes lead, per the
    decoder loglike contract (svae_tpu/nets/decoders.py).

    ``backend="pallas"`` runs the Kalman sweeps of the structured
    mean-field on the fused differentiable Pallas kernels with
    per-sequence state-averaged pair potentials (the bpairs layout);
    "xla" vmaps the per-sequence scan path; "auto" resolves to "pallas"
    on TPU and "xla" elsewhere. Drop-in equivalent (parity-tested,
    tests/test_slds.py).

    ``mask``: optional (T,) / (B, T) evidence mask -- falsy frames are
    missing observations (recognition potentials zeroed; the structured
    mean-field bridges them through the per-state dynamics -- correct EM
    missing-data semantics: the expected stats still cover every frame).
    ``lengths``: optional (B,) per-sequence lengths for ragged minibatches
    padded to a common T -- pad frames carry no evidence, pad transitions
    become normalized dummy factors on BOTH chains (N(0,I) on the
    continuous chain, uniform rows on the discrete chain), and pad
    transitions leave every M-step stat/count -- so training on padded
    batches matches the unpadded sequences exactly (tests/test_masking.py).
    Both compose; every backend supports them.
    """
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    J_diag, h = nn_potentials
    batched = J_diag.ndim == 3
    T = J_diag.shape[-2]
    if lengths is not None and not batched:
        raise ValueError("lengths= requires batched (B, T, d) potentials")
    B = J_diag.shape[0] if batched else 1
    ev_mask = lds_model._evidence_mask(mask, lengths, B, T, h.dtype)
    if ev_mask is not None:
        J_diag, h = lds_model.mask_potentials(
            (J_diag, h), ev_mask if batched else ev_mask[0])
    pair_w = (lds_model._pair_weight(lengths, T, h.dtype)
              if lengths is not None else None)
    if backend == "pallas":
        if not batched:
            J_diag, h = J_diag[None], h[None]
        samples, stats, local_kl = _batched_inference_pallas(
            global_natparam, (J_diag, h), key, num_samples,
            num_meanfield_iters, num_diff_iters, interpret=interpret,
            pair_weights=pair_w)
        if not batched:
            samples = samples[:, 0]
    elif batched:
        keys = jax.random.split(key, B)
        if pair_w is None:
            samples, stats, lkls = jax.vmap(
                lambda p, k: _sequence_inference(
                    global_natparam, p, k, num_samples, num_meanfield_iters,
                    num_diff_iters, parallel=parallel)
            )((J_diag, h), keys)
        else:
            samples, stats, lkls = jax.vmap(
                lambda p, k, w: _sequence_inference(
                    global_natparam, p, k, num_samples, num_meanfield_iters,
                    num_diff_iters, parallel=parallel, pair_weight=w)
            )((J_diag, h), keys, pair_w)
        samples = jnp.moveaxis(samples, 0, 1)  # (B, S, T, d) -> (S, B, T, d)
        stats = jax.tree.map(lambda s: jnp.sum(s, axis=0), stats)
        local_kl = jnp.sum(lkls)
    else:
        samples, stats, local_kl = _sequence_inference(
            global_natparam, (J_diag, h), key, num_samples,
            num_meanfield_iters, num_diff_iters, parallel=parallel)
    global_kl = prior_kl(global_natparam, prior_natparam)
    return samples, stats, global_kl, local_kl


# --------------------------------------------------------------------------
# streaming (serving-side) switching filter
# --------------------------------------------------------------------------


def make_online_filter(global_natparam, dtype=jnp.float32):
    """Streaming switching-state filter: consume one frame's recognition
    potentials at a time, emit per-regime probabilities, the filtered
    latent posterior, and the incremental predictive log-evidence
    ``log p(y_t | y_{1:t-1})`` (online surprise / anomaly score).

    Greenfield vs the reference (svae/models/slds.py is batch-only, like
    the LDS module); the switching analogue of
    ``models/lds.make_online_filter``. Exact inference in an SLDS is
    exponential in T, so this is the standard assumed-density /
    interacting-multiple-model (GPB2) collapse: carry one filtered
    Gaussian per regime plus regime weights, expand the K x K transition
    branches with the expected dynamics under q(theta) (the same
    ``exp E[log]`` potentials the structured mean-field uses), and
    moment-match each destination regime's branch mixture back to a
    single Gaussian. At K=1 every step is exact and reproduces the LDS
    online filter (tested, tests/test_slds.py).

    Returns ``(init_fn, step_fn)``:

      state, (w, mean, cov, logev) = init_fn((J_diag_1, h_1))
      state, (w, mean, cov, logev) = step_fn(state, (J_diag_t, h_t))

    ``w`` is the regime posterior q(z_t) (shape (K,); ``argmax`` for
    streaming segmentation), ``(mean, cov)`` the regime-collapsed filtered
    posterior of x_t, ``logev`` the predictive log-evidence increment.
    ``jax.vmap`` both functions for a batch of streams; wrap ``step_fn``
    in ``jax.lax.scan`` to replay a stored sequence.
    """
    from svae_tpu.utils import smallchol
    from svae_tpu.utils.psd import symmetrize

    init_dir, trans_dir, niw_np, mniw_np = global_natparam
    e_pi0 = dirichlet.expectedstats(init_dir).astype(dtype)    # (K,)
    e_Pi = dirichlet.expectedstats(trans_dir).astype(dtype)    # (K,K)
    (I1, I2), Ic = niw.expected_gaussian_natparam(niw_np)
    E1, E2, E3, Ec = mniw.expected_pair_potential(mniw_np)     # (K,d,d)x3,(K,)
    I1, I2, Ic, E1, E2, E3, Ec = jax.tree.map(
        lambda a: a.astype(dtype), (I1, I2, Ic, E1, E2, E3, Ec))
    K, d = E2.shape[0], E2.shape[-1]

    def _mean_cov(J, h):
        L = smallchol.chol(symmetrize(J))
        mean = smallchol.cho_solve(L, h)
        eye = jnp.broadcast_to(jnp.eye(d, dtype=J.dtype), J.shape)
        cov = smallchol.cho_solve_mat(L, eye)
        return mean, symmetrize(cov)

    def _node(potentials):
        J_diag, h = potentials
        return -0.5 * jnp.diag(J_diag.astype(dtype)), h.astype(dtype)

    def _collapse(w, mean, cov):
        """Moment-match a weighted Gaussian mixture (leading axis) to one
        Gaussian. ``w`` normalized over axis 0."""
        m = jnp.einsum("j,jd->d", w, mean)
        dm = mean - m
        C = jnp.einsum("j,jde->de", w, cov) + jnp.einsum(
            "j,jd,je->de", w, dm, dm)
        return m, symmetrize(C)

    def _outputs(w, J, h):
        means, covs = _mean_cov(J, h)        # (K,d), (K,d,d)
        mean, cov = _collapse(w, means, covs)
        return mean, cov

    def init_fn(potentials):
        n1, n2 = _node(potentials)
        J1 = -2.0 * (I1 + n1)
        h1 = I2 + n2
        logZ1 = kalman._gauss_logZ_info(J1, h1, Ic)
        logw = jax.nn.log_softmax(e_pi0)
        w = jnp.exp(logw)
        logev = logZ1 + jax.nn.logsumexp(e_pi0)
        J = jnp.broadcast_to(J1, (K, d, d))
        h = jnp.broadcast_to(h1, (K, d))
        mean, cov = _outputs(w, J, h)
        return (logw, J, h), (w, mean, cov, logev)

    def step_fn(state, potentials):
        logw, J, h = state                   # (K,), (K,d,d), (K,d)
        n1, n2 = _node(potentials)
        # each regime's Gaussian is carried normalized: implicit constant
        # c_j = -logZ(J_j, h_j, 0), folded into the branch's c slot below
        cnorm = -kalman._gauss_logZ_info(J, h, jnp.zeros((K,), dtype))
        # branch (j -> k): one chain leaf on (x_t, x_{t+1}) under regime
        # k's expected dynamics, with regime j's (normalized) filtered
        # potential folded into the (J11, h1) slots -- exactly the LDS
        # online step (models/lds.make_online_filter) per branch
        e = (
            -2.0 * E3[None, :] + J[:, None],             # (K,K,d,d)
            jnp.broadcast_to(-jnp.swapaxes(E2, -1, -2), (K, K, d, d)),
            jnp.broadcast_to(-2.0 * (E1 + n1), (K, K, d, d)),
            jnp.broadcast_to(h[:, None], (K, K, d)),
            jnp.broadcast_to(n2, (K, K, d)),
            Ec[None, :] + cnorm[:, None],
        )
        Jb, hb, cb = kalman.marginalize_first(e)         # (K,K,...)
        logZb = kalman._gauss_logZ_info(Jb, hb, cb)      # (K,K)
        # branch log-weights; state Gaussians are kept normalized
        # (logZ == 0), so logZb IS the branch evidence increment
        lw = logw[:, None] + e_Pi + logZb                # (K,K)
        logev = jax.nn.logsumexp(lw)
        logw_new = jax.nn.logsumexp(lw - logev, axis=0)  # (K,)
        # per-destination branch responsibilities, moment-match over j
        r = jnp.exp(lw - logev - logw_new[None, :])      # (K,K)
        means, covs = _mean_cov(Jb, hb)                  # (K,K,d),(K,K,d,d)
        m_k = jax.vmap(_collapse, in_axes=(1, 1, 1))(r, means, covs)
        mean_k, cov_k = m_k                              # (K,d), (K,d,d)
        # back to normalized info form
        Lc = smallchol.chol(cov_k)
        eye = jnp.broadcast_to(jnp.eye(d, dtype=dtype), cov_k.shape)
        J_new = symmetrize(smallchol.cho_solve_mat(Lc, eye))
        h_new = jnp.einsum("kde,ke->kd", J_new, mean_k)
        # renormalize the emitted weights: logsumexp keeps them within
        # ~1e-4 of simplex at f32, exact-sum output is the API contract
        w = jnp.exp(logw_new)
        w = w / jnp.sum(w)
        mean, cov = _collapse(w, mean_k, cov_k)
        return (logw_new, J_new, h_new), (w, mean, cov, logev)

    return init_fn, step_fn
