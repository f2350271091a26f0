"""LDS-SVAE: linear-dynamical-system prior composed with a neural decoder.

(reference: svae/models/lds.py -- run_inference / init_pgm_param /
lds_prior_expectedstats.)

Global natural parameters: ``(niw_natparam, mniw_natparam)`` -- a NIW factor
on the initial state's (mu, Sigma) and an MNIW factor on the homogeneous
dynamics (A, Sigma). The E-step takes expected pair/init potentials under
q(theta), adds the recognition net's per-frame diagonal evidence, and runs
the Kalman smoother + backward sampler (svae_tpu/ops/kalman.py; sequential
scan by default, O(log T)-span associative scan via ``parallel=True`` --
see the scan-flavor policy note there), vmapped over the minibatch.

Stats returned are congruent with the global natparams:
  NIW : (E[x_1 x_1^T], E[x_1], 1, 1) per sequence
  MNIW: (sum_t E[x_{t+1} x_{t+1}^T], sum_t E[x_{t+1} x_t^T],
         sum_t E[x_t x_t^T], T-1) per sequence
summed over the batch, so the conjugate natural-gradient update is pytree
addition in the training core.
"""

import jax
import jax.numpy as jnp

from svae_tpu.expfam import niw, mniw
from svae_tpu.ops import kalman
from svae_tpu.utils.psd import f32_linalg
from svae_tpu.utils.pytree import tree_sub, tree_dot


# --------------------------------------------------------------------------
# global parameter init
# --------------------------------------------------------------------------


def init_pgm_param(key, d, niw_conc=10.0, mniw_conc=10.0, A_scale=0.9,
                   Q_scale=0.1, dtype=jnp.float32):
    """Random global natparams: NIW on the initial state, MNIW centered on
    slightly-contractive dynamics A ~ A_scale * (random rotation-ish)
    (reference: svae/models/lds.py:init_pgm_param)."""
    k1, k2 = jax.random.split(key)
    # init-state NIW
    m0 = jnp.zeros((d,), dtype)
    kappa0 = jnp.asarray(niw_conc, dtype)
    nu0 = jnp.asarray(d + niw_conc, dtype)
    Phi0 = nu0 * jnp.eye(d, dtype=dtype)
    niw_natparam = niw.standard_to_natural(Phi0, m0, kappa0, nu0)

    # dynamics MNIW centered at a random near-orthogonal contraction
    G = jax.random.normal(k1, (d, d), dtype)
    Q_, _ = jnp.linalg.qr(G)
    M = A_scale * Q_
    V = (1.0 / mniw_conc) * jnp.eye(d, dtype=dtype)
    nu = jnp.asarray(d + mniw_conc, dtype)
    Phi = Q_scale * nu * jnp.eye(d, dtype=dtype)
    mniw_natparam = mniw.standard_to_natural(Phi, M, V, nu)
    return (niw_natparam, mniw_natparam)


def pgm_expectedstats(global_natparam):
    niw_natparam, mniw_natparam = global_natparam
    return (niw.expectedstats(niw_natparam), mniw.expectedstats(mniw_natparam))


# --------------------------------------------------------------------------
# potentials
# --------------------------------------------------------------------------


def expected_chain_potentials(global_natparam, T, dtype=None):
    """(init, pairs) chain potentials under q(theta), in the kernel's
    natural-parameter convention (svae_tpu/ops/__init__.py)."""
    niw_natparam, mniw_natparam = global_natparam
    (I1, I2), Ic = niw.expected_gaussian_natparam(niw_natparam)
    E1, E2, E3, Pc = mniw.expected_pair_potential(mniw_natparam)
    d = I2.shape[-1]
    if dtype is not None:
        I1, I2, Ic, E1, E2, E3, Pc = jax.tree.map(
            lambda a: a.astype(dtype), (I1, I2, Ic, E1, E2, E3, Pc)
        )
    bcast = lambda a: jnp.broadcast_to(a, (T - 1,) + a.shape)
    init = (I1, I2, Ic)
    pairs = (bcast(E1), bcast(E2), bcast(E3), bcast(Pc))
    return init, pairs


def _node_potentials(nn_potentials):
    """Diagonal evidence (J_diag, h) with (T, d) shapes -> kernel nodes
    (N1, N2) with N1_t = -1/2 diag(J_t)."""
    J_diag, h = nn_potentials
    N1 = -0.5 * jnp.vectorize(jnp.diag, signature="(d)->(d,d)")(J_diag)
    return (N1, h)


# --------------------------------------------------------------------------
# masking (missing observations / ragged batches)
# --------------------------------------------------------------------------


def mask_potentials(nn_potentials, mask):
    """Zero the recognition evidence at masked-out frames.

    ``mask`` is (T,) or (B, T), boolean or {0,1} float; frames where it is
    falsy contribute NO evidence to the posterior. Because the chain kernels
    work in information form, a zero node potential is exactly "this frame
    is unobserved": the smoother marginalizes the latent state through the
    dynamics prior there. Static shapes are preserved, so every backend
    (sequential / associative / chunked XLA scans, fused Pallas kernels)
    handles missing data with no kernel changes -- the TPU-native answer to
    irregular sampling and ragged minibatches (pad + mask, never dynamic
    shapes). Greenfield vs the reference (dense-evidence only).
    """
    J_diag, h = nn_potentials
    m = jnp.asarray(mask, h.dtype)[..., None]
    return (J_diag * m, h * m)


def _length_mask(lengths, B, T, dtype):
    """(B,) per-sequence lengths -> (B, T) {0,1} validity mask."""
    lengths = jnp.asarray(lengths)
    return (jnp.arange(T)[None, :] < lengths[:, None]).astype(dtype)


def _evidence_mask(mask, lengths, B, T, dtype):
    """Combine an explicit evidence mask with a trailing-pad length mask.
    Returns an (B, T) {0,1} array or None when neither is given."""
    out = None
    if mask is not None:
        out = jnp.broadcast_to(jnp.asarray(mask, dtype), (B, T))
    if lengths is not None:
        v = _length_mask(lengths, B, T, dtype)
        out = v if out is None else out * v
    return out


def _pair_weight(lengths, T, dtype):
    """(B,) lengths -> (B, T-1) transition-validity weights: transition t
    couples frames (t, t+1) and is real iff frame t+1 exists."""
    return (jnp.arange(1, T)[None, :]
            < jnp.asarray(lengths)[:, None]).astype(dtype)


def dummy_blend_pairs(pairs, w):
    """Blend pair potentials with the NORMALIZED dummy transition
    x_{t+1} ~ N(0, I) (log-density -1/2 x'x' - d/2 log 2pi) wherever the
    transition-validity weight ``w`` is 0. ``pairs`` = (P1, P2, P3, Pc)
    with leading axes matching ``w`` (e.g. (T-1, d, d) with w (T-1,), or
    (B, T-1, d, d) with w (B, T-1)).

    Why a dummy instead of just zero evidence: the chain's pair potentials
    are E_q[log p(x'|x, theta)] under the MNIW posterior, which is NOT a
    normalized conditional -- integrating a pad frame out would leak an
    x_t-dependent Jensen-gap term E[A'S^-1 A] - E[A'S^-1]E[S^-1]^-1 E[S^-1 A]
    back into the real frames. The dummy factorizes the pad tail away
    exactly: each pad transition integrates to 1 and couples nothing, so
    logZ / local KL / real-frame marginals match the unpadded chain to
    machine precision (tests/test_masking.py)."""
    P1, P2, P3, Pc = pairs
    d = P1.shape[-1]
    dtype = P1.dtype
    w = jnp.asarray(w, dtype)
    wm = w[..., None, None]
    eye = jnp.eye(d, dtype=dtype)
    P1b = wm * P1 + (1.0 - wm) * (-0.5) * eye
    P2b = wm * P2
    P3b = wm * P3
    Pcb = w * Pc + (1.0 - w) * jnp.asarray(
        -0.5 * d * jnp.log(2.0 * jnp.pi), dtype)
    return P1b, P2b, P3b, Pcb


def _ragged_pairs(pairs, lengths, T, dtype):
    """Per-sequence (B, T-1, ...) pair potentials for a ragged batch:
    broadcast the shared (T-1, ...) pairs over the batch and swap in the
    normalized dummy at pad transitions (see :func:`dummy_blend_pairs`)."""
    w = _pair_weight(lengths, T, dtype)  # (B, T-1)
    pairs_b = jax.tree.map(lambda p: p[None], pairs)
    return dummy_blend_pairs(pairs_b, w)


# --------------------------------------------------------------------------
# single-sequence E-step
# --------------------------------------------------------------------------


def _sequence_inference(init, pairs, nn_potentials, key, num_samples,
                        parallel=False, valid=None):
    """One sequence: returns (samples (S, T, d), seq stats, local_kl).

    ``valid`` is an optional (T,) {0,1} frame-validity weight (trailing-pad
    ragged-batch support): transition t -> t+1 enters the MNIW stats with
    weight valid[t+1], so padded tail frames contribute nothing to the
    M-step (their evidence must already be zeroed via mask_potentials;
    the local KL is then exact automatically -- zero-potential tail frames
    cancel between the posterior and prior log-normalizers)."""
    nodes = _node_potentials(nn_potentials)
    samples, (Ex, ExxT, Exnxt), logZ = kalman.lds_inference(
        init, pairs, nodes, key, num_samples, parallel=parallel
    )
    N1, N2 = nodes
    local_kl = (
        jnp.sum(N1 * ExxT) + jnp.sum(N2 * Ex) - logZ
    )
    T = Ex.shape[0]
    one = jnp.ones((), Ex.dtype)
    niw_stats = (ExxT[0], Ex[0], one, one)
    ExnxtT = jnp.swapaxes(Exnxt, -1, -2)  # E[x_{t+1} x_t^T]
    if valid is None:
        mniw_stats = (
            jnp.sum(ExxT[1:], axis=0),
            jnp.sum(ExnxtT, axis=0),
            jnp.sum(ExxT[:-1], axis=0),
            (T - 1) * one,
        )
    else:
        w = valid[1:, None, None]
        mniw_stats = (
            jnp.sum(w * ExxT[1:], axis=0),
            jnp.sum(w * ExnxtT, axis=0),
            jnp.sum(w * ExxT[:-1], axis=0),
            jnp.sum(valid) - one,
        )
    return samples, (niw_stats, mniw_stats), local_kl


# --------------------------------------------------------------------------
# batched fused-kernel E-step (backend="pallas")
# --------------------------------------------------------------------------


def _batched_inference_pallas_stationary(init, pair_mats, nn_potentials,
                                         key, num_samples, interpret=False,
                                         valid=None):
    """Minibatch E-step on the fully packed stationary-diagonal pipeline
    (svae_tpu/ops/pallas_estep.py): pair potentials ride VMEM as whole
    operands, only the diagonal recognition evidence is streamed, and the
    moment assembly + stat reductions run in the kernels' packed lane
    layout -- no (B, T, d, d) materialization anywhere. Used whenever the
    chain is time-homogeneous (``lengths=None``); parity-tested against
    _batched_inference_pallas."""
    from svae_tpu.ops import pallas_estep

    return pallas_estep.lds_estep_stationary(
        init, pair_mats, nn_potentials, key, num_samples, valid=valid,
        interpret=interpret)


def _batched_inference_pallas(init, pairs, nn_potentials, key, num_samples,
                              interpret=False, valid=None):
    """Minibatch E-step on the differentiable fused Pallas kernels
    (svae_tpu/ops/pallas_vjp.py) -- the batch rides the kernels' lane axis
    natively instead of vmapping the per-sequence scan. Returns the same
    (samples, stats, local_kl) as the vmapped XLA path (parity-tested).

    ``valid`` is an optional (B, T) {0,1} frame-validity weight (see
    _sequence_inference); the kernels themselves are mask-free -- stats are
    assembled from the full (B, T) moments out here, so ragged batches cost
    nothing inside the fused scan."""
    from svae_tpu.ops import pallas_vjp

    J_diag, h = nn_potentials
    N1 = -0.5 * jnp.vectorize(jnp.diag, signature="(d)->(d,d)")(J_diag)
    nodes = (N1, h)
    samples, (Ex, ExxT, Exnxt), logZ = pallas_vjp.lds_estep(
        init, pairs, nodes, key, num_samples, interpret=interpret)

    local_kl = (jnp.sum(N1 * ExxT) + jnp.sum(h * Ex) - jnp.sum(logZ))
    B, T = Ex.shape[0], Ex.shape[1]
    cnt = jnp.asarray(B, Ex.dtype)
    niw_stats = (jnp.sum(ExxT[:, 0], axis=0), jnp.sum(Ex[:, 0], axis=0),
                 cnt, cnt)
    ExnxtT = jnp.swapaxes(Exnxt, -1, -2)  # E[x_{t+1} x_t^T]
    if valid is None:
        mniw_stats = (
            jnp.sum(ExxT[:, 1:], axis=(0, 1)),
            jnp.sum(ExnxtT, axis=(0, 1)),
            jnp.sum(ExxT[:, :-1], axis=(0, 1)),
            (T - 1) * cnt,
        )
    else:
        w = valid[:, 1:, None, None]
        mniw_stats = (
            jnp.sum(w * ExxT[:, 1:], axis=(0, 1)),
            jnp.sum(w * ExnxtT, axis=(0, 1)),
            jnp.sum(w * ExxT[:, :-1], axis=(0, 1)),
            jnp.sum(valid) - cnt,
        )
    return samples, (niw_stats, mniw_stats), local_kl


# --------------------------------------------------------------------------
# prior KL
# --------------------------------------------------------------------------


def prior_kl(global_natparam, prior_natparam):
    """KL(q(theta) || p(theta)) = NIW KL + MNIW KL
    (reference: svae/models/lds.py prior KL assembly)."""
    niw_q, mniw_q = global_natparam
    niw_p, mniw_p = prior_natparam
    niw_kl = (
        tree_dot(tree_sub(niw_q, niw_p), niw.expectedstats(niw_q))
        - jnp.sum(niw.logZ(niw_q))
        + jnp.sum(niw.logZ(niw_p))
    )
    mniw_kl = (
        tree_dot(tree_sub(mniw_q, mniw_p), mniw.expectedstats(mniw_q))
        - jnp.sum(mniw.logZ(mniw_q))
        + jnp.sum(mniw.logZ(mniw_p))
    )
    return niw_kl + mniw_kl


# --------------------------------------------------------------------------
# the model contract
# --------------------------------------------------------------------------


@f32_linalg
def run_inference(prior_natparam, global_natparam, nn_potentials, key,
                  num_samples=1, parallel=False, backend="xla",
                  interpret=False, mask=None, lengths=None):
    """E-step + sampling + KLs (reference: svae/models/lds.py:run_inference).

    ``nn_potentials`` = (J_diag, h), each (T, d) for a single sequence or
    (B, T, d) for a minibatch (vmapped over B; per-sequence stats and KLs
    are summed). Returns (samples, stats, global_kl, local_kl) with samples
    shaped (S, T, d) or (S, B, T, d) -- sample axes lead, per the decoder
    loglike contract (svae_tpu/nets/decoders.py).

    ``backend``: "xla" runs the lax.scan kernels (svae_tpu/ops/kalman.py,
    sequential or -- ``parallel=True`` -- O(log T)-span associative scan);
    "pallas" runs the fused differentiable Pallas kernels with hand-derived
    adjoints (svae_tpu/ops/pallas_vjp.py; the production TPU training path,
    the analogue of the reference's Cython fast path --
    svae/lds/cython_lds_inference.pyx). "auto" resolves to "pallas" on TPU
    and "xla" elsewhere (the fast path as an import-time drop-in, like the
    reference's Cython). Both are drop-in equivalent (parity-tested,
    tests/test_pallas_vjp.py, tests/test_lds_model.py; on-chip gate
    benchmarks/onchip_parity.py); ``interpret`` runs Pallas in interpreter
    mode (CPU testing).

    ``mask``: optional (T,) / (B, T) evidence mask -- falsy frames are
    treated as MISSING observations (their recognition potentials are
    zeroed; the smoother bridges them through the dynamics). Expected
    sufficient statistics still cover every frame, which is the correct
    EM treatment of missing data. ``lengths``: optional (B,) per-sequence
    lengths for ragged minibatches padded to a common T -- pad frames
    beyond a sequence's length carry no evidence AND are excluded from
    the MNIW statistics/counts, so training on padded batches matches
    training on the unpadded sequences exactly (tests/test_masking.py).
    Both compose; every backend supports them (masking happens outside
    the kernels on static shapes -- the TPU-native ragged story).
    """
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    J_diag, h = nn_potentials
    batched = J_diag.ndim == 3
    T = J_diag.shape[-2]
    if lengths is not None and not batched:
        raise ValueError("lengths= requires batched (B, T, d) potentials")
    # compute the expected potentials ONCE; broadcast over T-1 only for
    # the paths that consume streamed pairs (the stationary Pallas
    # pipeline takes the single matrices directly)
    niw_np_, mniw_np_ = global_natparam
    (I1_, I2_), Ic_ = niw.expected_gaussian_natparam(niw_np_)
    pair_mats = mniw.expected_pair_potential(mniw_np_)
    init, pair_mats = jax.tree.map(
        lambda a: a.astype(h.dtype), ((I1_, I2_, Ic_), pair_mats))
    stationary_fast = backend == "pallas" and lengths is None
    if not stationary_fast:
        bcast = lambda a: jnp.broadcast_to(a, (T - 1,) + a.shape)
        pairs = tuple(bcast(p) for p in pair_mats)

    B = J_diag.shape[0] if batched else 1
    ev_mask = _evidence_mask(mask, lengths, B, T, h.dtype)
    if ev_mask is not None:
        J_diag, h = mask_potentials(
            (J_diag, h), ev_mask if batched else ev_mask[0])
    valid = (_length_mask(lengths, B, T, h.dtype)
             if lengths is not None else None)
    if lengths is not None:
        pairs = _ragged_pairs(pairs, lengths, T, h.dtype)

    if backend == "pallas":
        if not batched:
            J_diag, h = J_diag[None], h[None]
        # route on the same flag that skipped the pair broadcast above:
        # the two conditions must never diverge (`pairs` only exists when
        # stationary_fast is False)
        if stationary_fast:
            # time-homogeneous chain: the fully packed
            # stationary-diagonal pipeline takes the single pair
            # matrices directly -- no broadcast streams, no
            # (B, T, d, d) materialization anywhere.
            samples, stats, local_kl = _batched_inference_pallas_stationary(
                init, pair_mats, (J_diag, h), key, num_samples,
                interpret=interpret, valid=valid)
        else:
            samples, stats, local_kl = _batched_inference_pallas(
                init, pairs, (J_diag, h), key, num_samples,
                interpret=interpret, valid=valid)
        if not batched:
            samples = samples[:, 0]
    elif batched:
        keys = jax.random.split(key, B)
        if valid is None:
            samples, stats, local_kls = jax.vmap(
                lambda p, k: _sequence_inference(
                    init, pairs, p, k, num_samples, parallel=parallel)
            )((J_diag, h), keys)
        else:
            samples, stats, local_kls = jax.vmap(
                lambda pr, p, k, v: _sequence_inference(
                    init, pr, p, k, num_samples, parallel=parallel,
                    valid=v)
            )(pairs, (J_diag, h), keys, valid)
        samples = jnp.moveaxis(samples, 0, 1)  # (B, S, T, d) -> (S, B, T, d)
        stats = jax.tree.map(lambda s: jnp.sum(s, axis=0), stats)
        local_kl = jnp.sum(local_kls)
    else:
        samples, stats, local_kl = _sequence_inference(
            init, pairs, (J_diag, h), key, num_samples, parallel=parallel
        )

    global_kl = prior_kl(global_natparam, prior_natparam)
    return samples, stats, global_kl, local_kl


# --------------------------------------------------------------------------
# posterior inference / forecasting (no-gradient user APIs)
# --------------------------------------------------------------------------


@f32_linalg
def posterior_moments(global_natparam, nn_potentials, parallel=False,
                      mask=None, lengths=None, backend="auto",
                      interpret=False):
    """Smoothed posterior moments for one sequence or a batch:
    ``(Ex, ExxT, Exnxt, logZ)``. The eval-side twin of run_inference
    without sampling/KLs (reference: the smoother outputs the experiments
    plot). ``mask`` / ``lengths`` mark missing frames / ragged batches as
    in run_inference: masked frames get the dynamics-bridged (interpolated)
    posterior -- the smoother IS the missing-data imputer.

    ``backend``: "pallas" runs batched time-homogeneous (``lengths=None``)
    inputs through the packed stationary pipeline
    (svae_tpu/ops/pallas_estep.lds_moments_stationary -- the production
    fast path); "xla" the vmapped scan smoother; "auto" picks "pallas" on
    TPU for the shapes it serves and "xla" otherwise. An EXPLICIT
    ``backend="pallas"`` with ``lengths=`` raises (the packed moments
    pipeline is stationary-only; use "auto"/"xla" for ragged batches),
    and ``parallel=`` selects the associative-scan smoother on the XLA
    path only -- the Pallas pipeline has its own schedule and ignores it.
    """
    if backend == "pallas" and lengths is not None:
        raise ValueError(
            "posterior_moments(backend='pallas') does not serve ragged "
            "(lengths=) batches -- the packed pipeline is stationary-only. "
            "Use backend='auto' or 'xla' for ragged batches.")
    J_diag, h = nn_potentials
    batched = J_diag.ndim == 3
    T = J_diag.shape[-2]
    B = J_diag.shape[0] if batched else 1
    ev_mask = _evidence_mask(mask, lengths, B, T, h.dtype)
    if ev_mask is not None:
        J_diag, h = mask_potentials(
            (J_diag, h), ev_mask if batched else ev_mask[0])
    if backend == "auto":
        backend = ("pallas" if jax.default_backend() == "tpu" and batched
                   and lengths is None else "xla")
    if backend == "pallas" and lengths is None:
        from svae_tpu.ops import pallas_estep

        niw_np, mniw_np = global_natparam
        (I1, I2), Ic = niw.expected_gaussian_natparam(niw_np)
        E1, E2, E3, Pc = mniw.expected_pair_potential(mniw_np)
        init_m, mats = jax.tree.map(
            lambda a: a.astype(h.dtype),
            ((I1, I2, Ic), (E1, E2, E3, Pc)))
        Jd_b = J_diag if batched else J_diag[None]
        h_b = h if batched else h[None]
        logZ, Ex, ExxT, Exnxt = pallas_estep.lds_moments_stationary(
            init_m, mats, (Jd_b, h_b), interpret=interpret)
        if not batched:
            return Ex[0], ExxT[0], Exnxt[0], logZ[0]
        return Ex, ExxT, Exnxt, logZ
    init, pairs = expected_chain_potentials(global_natparam, T,
                                            dtype=h.dtype)

    def one(p, pr):
        nodes = _node_potentials(p)
        logZ, Ex, ExxT, Exnxt = kalman.lds_smoother(init, pr, nodes,
                                                    parallel=parallel)
        return Ex, ExxT, Exnxt, logZ

    if lengths is not None:
        if not batched:
            raise ValueError("lengths= requires batched (B, T, d) potentials")
        pairs_b = _ragged_pairs(pairs, lengths, T, h.dtype)
        return jax.vmap(one)((J_diag, h), pairs_b)
    if batched:
        return jax.vmap(lambda p: one(p, pairs))((J_diag, h))
    return one((J_diag, h), pairs)


@f32_linalg
def make_online_filter(global_natparam, dtype=jnp.float32):
    """Streaming (serving-side) filter: consume one frame's recognition
    potentials at a time, emit the filtered posterior and the incremental
    predictive log-evidence ``log p(y_t | y_{1:t-1})`` (an online surprise
    / anomaly score). Greenfield vs the reference (which is batch-only);
    built on the same chain-element algebra as the batch filter
    (ops/kalman.py), so it matches ``lds_filter`` exactly (tested).

    Returns ``(init_fn, step_fn)``:

      state, (mean, cov, logev) = init_fn((J_diag_1, h_1))   # frame 1
      state, (mean, cov, logev) = step_fn(state, (J_diag_t, h_t))

    ``(J_diag_t, h_t)`` are one frame's diagonal evidence potentials,
    shape (d,). ``jax.vmap`` both functions for a batch of streams; wrap
    ``step_fn`` in ``jax.lax.scan`` to replay a stored sequence.
    """
    from svae_tpu.utils import smallchol
    from svae_tpu.utils.psd import symmetrize

    init, pairs = expected_chain_potentials(global_natparam, 2, dtype=dtype)
    I1, I2, Ic = init
    P1, P2, P3, Pc = (p[0] for p in pairs)  # homogeneous single-step pair

    def _mean_cov(J, h):
        L = smallchol.chol(symmetrize(J))
        mean = smallchol.cho_solve(L, h)
        cov = smallchol.cho_solve_mat(L, jnp.eye(J.shape[-1], dtype=J.dtype))
        return mean, symmetrize(cov)

    def _node(potentials):
        J_diag, h = potentials
        return -0.5 * jnp.diag(J_diag), h

    def init_fn(potentials):
        n1, n2 = _node(potentials)
        J = -2.0 * (I1 + n1)
        h = I2 + n2
        c = Ic
        logZ = kalman._gauss_logZ_info(J, h, c)
        mean, cov = _mean_cov(J, h)
        return (J, h, c, logZ), (mean, cov, logZ)

    def step_fn(state, potentials):
        J, h, c, logZ_prev = state
        n1, n2 = _node(potentials)
        # one chain leaf over (x_t, x_{t+1}) owning node t+1, with the
        # running filtered potential folded into its (J11, h1, c) slots
        # (exactly build_leaves' ownership, ops/kalman.py)
        e = (
            -2.0 * P3 + J,
            -jnp.swapaxes(P2, -1, -2),
            -2.0 * (P1 + n1),
            h,
            n2,
            Pc + c,
        )
        Jn, hn, cn = kalman.marginalize_first(e)
        logZ = kalman._gauss_logZ_info(Jn, hn, cn)
        mean, cov = _mean_cov(Jn, hn)
        return (Jn, hn, cn, logZ), (mean, cov, logZ - logZ_prev)

    return init_fn, step_fn


@f32_linalg
def predict(global_natparam, nn_potentials, key, num_steps, num_samples=1,
            parallel=False, mask=None):
    """Forecast: condition on an observed prefix (via the recognition
    potentials), then roll the expected dynamics forward ``num_steps``
    with process noise (reference: the dots-experiment prediction plots).

    Returns latent trajectories shaped (num_samples, T + num_steps, d)
    (or with a leading batch axis if ``nn_potentials`` is batched):
    the first T entries are posterior samples of the conditioning window,
    the remainder are forecast rollouts. ``mask`` marks missing frames in
    the conditioning window (as in run_inference).
    """
    from svae_tpu.utils import smallchol
    from svae_tpu.utils.psd import symmetrize

    niw_np, mniw_np = global_natparam
    A, Sigma = mniw.posterior_mean_params(mniw_np)
    d = A.shape[-1]
    Ls = smallchol.chol(Sigma)

    J_diag, h = nn_potentials
    if mask is not None:
        J_diag, h = mask_potentials((J_diag, h), mask)
    batched = J_diag.ndim == 3

    def one(p, k):
        T = p[1].shape[0]
        init, pairs = expected_chain_potentials(global_natparam, T,
                                                dtype=p[1].dtype)
        nodes = _node_potentials(p)
        k1, k2 = jax.random.split(k)
        xs = kalman.lds_sample(init, pairs, nodes, k1, num_samples,
                               parallel=parallel)  # (S, T, d)
        eps = jax.random.normal(k2, (num_steps,) + xs.shape[:-2] + (d,),
                                xs.dtype)

        def roll(x, e):
            nxt = (A @ x[..., None])[..., 0] + (Ls @ e[..., None])[..., 0]
            return nxt, nxt

        _, future = jax.lax.scan(roll, xs[..., -1, :], eps)
        future = jnp.moveaxis(future, 0, -2)  # (S, num_steps, d)
        return jnp.concatenate([xs, future], axis=-2)

    if batched:
        B = J_diag.shape[0]
        keys = jax.random.split(key, B)
        return jax.vmap(one)((J_diag, h), keys)
    return one((J_diag, h), key)
