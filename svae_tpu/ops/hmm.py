"""Parallel HMM inference: O(log T)-span forward algorithm in log space.

TPU-native replacement for the reference's sequential forward-backward
(reference: svae/hmm/hmm_inference.py:hmm_logZ and
svae/hmm/cython_hmm_inference.pyx), following the temporal-parallelization
of HMM inference (Sarkka et al., arXiv:2102.05743): time steps become K x K
log-potential matrices combined by an associative logsumexp-matmul, so
``lax.associative_scan`` evaluates the chain in O(K^3 log T) span.

The combine is implemented as a *real* matmul of shifted exponentials so it
rides the MXU:  C = log(exp(A - rowmax) @ exp(B - colmax)) + shifts.

The differentiation contract is the reference's own:
``expected stats = grad(logZ)`` -- grads w.r.t. log_obs give node marginals
q(z_t), grads w.r.t. log_trans give pairwise transition marginals, grad
w.r.t. log_init gives q(z_1). ``hmm_marginals`` packages this.
"""

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp


@jax.custom_vjp
def _logmatmul(A, B):
    """Stable log-space matrix product C(i,k) = logsumexp_j A(i,j)+B(j,k),
    batched over leading axes, MXU-friendly.

    Carries a hand-written VJP: the AD-derived backward of log(exp-matmul)
    forms 1/prod reciprocals that overflow/NaN in f32 on TPU once messages
    sharpen (underflowed prod entries; whether the NaN materializes is XLA
    fusion-order dependent -- observed in the SLDS mean-field). The custom
    backward uses the softmax-weight form

        dC/dA(i,j) = sum_k ct(i,k) W(i,j,k),
        W(i,j,k)   = exp(A(i,j) + B(j,k) - C(i,k)) in [0, 1],

    computed as two matmuls with every intermediate bounded by
    |ct| / floor with floor = sqrt(tiny), so nothing can overflow. Clamped
    entries sit >= 43 nats below the row max (value error ~1e-19: nil).
    """
    C, _ = _logmatmul_fwd(A, B)
    return C


def _logmatmul_fwd(A, B):
    Ma = jnp.max(A, axis=-1, keepdims=True)  # (..., K, 1)
    Mb = jnp.max(B, axis=-2, keepdims=True)  # (..., 1, K)
    Ma = jnp.where(jnp.isfinite(Ma), Ma, 0.0)
    Mb = jnp.where(jnp.isfinite(Mb), Mb, 0.0)
    Ea = jnp.exp(A - Ma)
    Eb = jnp.exp(B - Mb)
    prod = jnp.matmul(Ea, Eb)
    floor = jnp.sqrt(jnp.finfo(prod.dtype).tiny)
    prodc = jnp.maximum(prod, floor)
    C = jnp.log(prodc) + Ma + Mb
    return C, (Ea, Eb, prodc)


def _logmatmul_bwd(res, ct):
    Ea, Eb, prodc = res
    S = ct / prodc  # bounded by |ct| * 9.2e18 (f32): no overflow possible
    gA = Ea * jnp.matmul(S, jnp.swapaxes(Eb, -1, -2))
    gB = Eb * jnp.matmul(jnp.swapaxes(Ea, -1, -2), S)
    return gA, gB


_logmatmul.defvjp(_logmatmul_fwd, _logmatmul_bwd)


def _elements(log_trans, log_obs):
    """Chain elements M_t(i,j) = log_trans_t(i,j) + log_obs_{t+1}(j),
    t = 1..T-1 (log_trans may be (K,K) homogeneous or (T-1,K,K))."""
    T = log_obs.shape[-2]
    if log_trans.ndim == log_obs.ndim:  # homogeneous: (..., K, K)
        lt = jnp.broadcast_to(
            log_trans[..., None, :, :],
            log_obs.shape[:-2] + (T - 1,) + log_trans.shape[-2:],
        )
    else:
        lt = log_trans
    return lt + log_obs[..., 1:, None, :]


def hmm_logZ(log_init, log_trans, log_obs, parallel=False):
    """Log-partition of the HMM chain. Fully differentiable; see module
    docstring for the grad contract. Batched over leading axes of log_obs
    (log_init/log_trans broadcast)."""
    T = log_obs.shape[-2]
    a0 = log_init + log_obs[..., 0, :]
    M = _elements(log_trans, log_obs)
    if parallel:
        total = jax.lax.associative_scan(_logmatmul, M, axis=log_obs.ndim - 2)
        total_last = total[..., T - 2, :, :]
        aT = logsumexp(a0[..., :, None] + total_last, axis=-2)
    else:
        Mm = jnp.moveaxis(M, log_obs.ndim - 2, 0)

        def step(a, m):
            a = logsumexp(a[..., :, None] + m, axis=-2)
            return a, None

        aT, _ = jax.lax.scan(step, a0, Mm)
    return logsumexp(aT, axis=-1)


def hmm_marginals(log_init, log_trans, log_obs, parallel=False):
    """(logZ, node_marginals, pair_marginals, init_marginal) via one
    backward pass of the logZ graph -- the reference's
    ``expectedstats = grad(logZ)`` mechanism made literal.

    pair_marginals: (T-1, K, K) when log_trans is time-varying, else the
    *summed* transition counts (K, K) -- exactly the sufficient statistic the
    Dirichlet natural gradient needs.
    """
    def f(li, lt, lo):
        return jnp.sum(hmm_logZ(li, lt, lo, parallel=parallel))

    logZ, grads = jax.value_and_grad(f, argnums=(0, 1, 2))(
        log_init, log_trans, log_obs
    )
    g_init, g_trans, g_obs = grads
    return logZ, g_obs, g_trans, g_init


def hmm_posterior(log_init, log_trans, log_obs, parallel=False,
                  pair_weights=None):
    """Direct forward-backward posterior: ``(logZ, node_marginals (T, K),
    pair_sum (K, K), init_marginal (K,))``.

    Same results as :func:`hmm_marginals` (tested identity) but built from
    explicit alpha/beta scans instead of grad(logZ) -- no backward graph
    gets traced, which roughly halves the compiled size and cost when the
    caller only needs marginals (the SLDS mean-field sweeps). Fully
    differentiable, so it also serves the truncated-backprop tail.
    ``pair_sum`` are the summed transition counts q(z_t=i, z_{t+1}=j)
    (the Dirichlet natural-gradient stat). ``log_trans`` may be (K, K)
    homogeneous or (T-1, K, K) time-varying (the ragged-batch path swaps
    a normalized uniform dummy in at pad transitions). ``pair_weights``
    (T-1,) weights the pair-count sum -- pad transitions are excluded from
    the M-step stat.
    """
    assert log_obs.ndim == 2, "hmm_posterior expects unbatched log_obs; vmap it"
    T, K = log_obs.shape
    a0 = log_init + log_obs[0]
    M = _elements(log_trans, log_obs)  # (T-1, K, K)
    if parallel:
        prefix = jax.lax.associative_scan(_logmatmul, M, axis=0)
        # alpha[t+1](j) = lse_i a0(i) + prefix[t](i, j)
        alpha_rest = logsumexp(a0[None, :, None] + prefix, axis=1)
        alpha = jnp.concatenate([a0[None], alpha_rest], axis=0)  # (T, K)
        suffix = jax.lax.associative_scan(
            lambda a, b: _logmatmul(b, a), M, axis=0, reverse=True
        )
        beta_head = logsumexp(suffix, axis=-1)  # beta[t], t = 1..T-1
        beta = jnp.concatenate(
            [beta_head, jnp.zeros((1, K), log_obs.dtype)], axis=0
        )
    else:
        def fstep(a, m):
            a = logsumexp(a[:, None] + m, axis=0)
            return a, a

        _, alpha_rest = jax.lax.scan(fstep, a0, M)
        alpha = jnp.concatenate([a0[None], alpha_rest], axis=0)

        def bstep(b, m):
            b = logsumexp(m + b[None, :], axis=-1)
            return b, b

        bT = jnp.zeros((K,), log_obs.dtype)
        _, beta_body = jax.lax.scan(bstep, bT, M, reverse=True)
        beta = jnp.concatenate([beta_body, bT[None]], axis=0)

    logZ = logsumexp(alpha[-1], axis=-1)
    node = jnp.exp(alpha + beta - logZ)
    # pair_t(i, j) = exp(alpha[t](i) + M[t](i,j) + beta[t+1](j) - logZ)
    pair = jnp.exp(
        alpha[:-1, :, None] + M + beta[1:, None, :] - logZ
    )
    if pair_weights is None:
        pair_sum = jnp.sum(pair, axis=0)
    else:
        pair_sum = jnp.einsum(
            "t,tij->ij", jnp.asarray(pair_weights, pair.dtype), pair)
    return logZ, node, pair_sum, node[0]


def hmm_viterbi(log_init, log_trans, log_obs, parallel=False):
    """MAP state path (Viterbi decode) by max-plus message passing:
    ``(path int32 (T,), score)`` with ``score = max_z log p(z, y)`` up to
    the observation normalizer (reference: the max-product counterpart of
    svae/hmm/hmm_inference.py's sum-product recursion; same chain-element
    layout as :func:`hmm_logZ`).

    The traceback needs no stored backpointers: with all forward max-plus
    messages delta_t kept, ``z_t = argmax_i delta_t(i) + M_t(i, z_{t+1})``
    re-derives them, so the ``parallel=True`` flavor can compute delta by
    an O(log T)-span max-plus associative scan (the tropical-semiring twin
    of the logsumexp scan) and share the same cheap traceback."""
    assert log_obs.ndim == 2, "hmm_viterbi expects unbatched log_obs; vmap it"
    T, K = log_obs.shape
    d0 = log_init + log_obs[0]
    M = _elements(log_trans, log_obs)  # (T-1, K, K)
    if parallel:
        def maxplus(a, b):
            return jnp.max(a[..., :, :, None] + b[..., None, :, :], axis=-2)

        prefix = jax.lax.associative_scan(maxplus, M, axis=0)
        delta_rest = jnp.max(d0[None, :, None] + prefix, axis=1)
        delta = jnp.concatenate([d0[None], delta_rest], axis=0)  # (T, K)
    else:
        def step(d, m):
            d = jnp.max(d[:, None] + m, axis=0)
            return d, d

        _, delta_rest = jax.lax.scan(step, d0, M)
        delta = jnp.concatenate([d0[None], delta_rest], axis=0)

    zT = jnp.argmax(delta[-1])
    score = delta[-1, zT]

    def bstep(z_next, inp):
        d_t, m_t = inp
        z = jnp.argmax(d_t + m_t[:, z_next])
        return z, z

    _, zs = jax.lax.scan(bstep, zT, (delta[:-1], M), reverse=True)
    path = jnp.concatenate([zs, zT[None]], axis=0).astype(jnp.int32)
    return path, score


def hmm_sample(log_init, log_trans, log_obs, key, num_samples=(), parallel=False):
    """Posterior path samples z_{1:T} via backward filtering + forward
    sampling with Gumbel argmax (discrete; no reparameterization).

    Returns int32 array of shape num_samples + (T,).
    """
    if isinstance(num_samples, int):
        num_samples = (num_samples,)
    S = tuple(num_samples)
    assert log_obs.ndim == 2, "hmm_sample expects unbatched log_obs; vmap it"
    T, K = log_obs.shape
    M = _elements(log_trans, log_obs)  # (T-1, K, K)
    # backward messages: beta[t](i) = log-mass of futures given z_t = i
    if parallel:
        suffix = jax.lax.associative_scan(
            lambda a, b: _logmatmul(b, a), M, axis=0, reverse=True
        )
        beta = logsumexp(suffix, axis=-1)  # (T-1, K)
    else:
        def bstep(b, m):
            b = logsumexp(m + b[None, :], axis=-1)
            return b, b

        b_last = jnp.zeros((K,), log_obs.dtype)
        _, beta = jax.lax.scan(bstep, b_last, M, reverse=True)
    beta = jnp.concatenate([beta, jnp.zeros((1, K), log_obs.dtype)], axis=0)

    # forward sampling: p(z_1) propto a0 + beta[1-indexed 1]; then
    # p(z_{t+1} | z_t) propto M[t](z_t, .) + beta[t+1]
    a0 = log_init + log_obs[0]
    k0, k1 = jax.random.split(key)
    g0 = jax.random.gumbel(k0, S + (K,), log_obs.dtype)
    z0 = jnp.argmax(a0 + beta[0] + g0, axis=-1)
    gs = jax.random.gumbel(k1, (T - 1,) + S + (K,), log_obs.dtype)

    def fstep(z, inp):
        m_t, beta_t, g_t = inp
        logits = m_t[z]  # gather rows: S + (K,)
        z_next = jnp.argmax(logits + beta_t + g_t, axis=-1)
        return z_next, z_next

    _, zs = jax.lax.scan(fstep, z0, (M, beta[1:], gs))
    return jnp.moveaxis(jnp.concatenate([z0[None], zs], axis=0), 0, -1)
