"""Parallel (O(log T)-span) natural-parameter Kalman inference.

TPU-native replacement for the reference's sequential Cython message passing
(reference: svae/lds/lds_inference.py and svae/lds/cython_lds_inference.pyx
-- natural_filter_forward_general / natural_smoother_general /
natural_sample_backward_general), built on the temporal-parallelization idea
of Sarkka & Garcia-Fernandez (arXiv:1905.13002) but formulated uniformly as
an associative *Gaussian chain-element algebra*:

An element represents the log-potential of a contiguous time block as a
joint Gaussian potential over its (first, last) variables:

    e = (J11, J12, J22, h1, h2, c)
    e(xf, xl) = -1/2 xf^T J11 xf - xf^T J12 xl - 1/2 xl^T J22 xl
                + h1^T xf + h2^T xl + c

Combining adjacent blocks marginalizes the shared variable (one Schur
complement + one Cholesky per combine) -- associative by Fubini, so
``lax.associative_scan`` evaluates all prefixes/suffixes in O(log T) span:

Scan-flavor policy: every entry point takes ``parallel``; False (the
default) evaluates the recursions as ``lax.scan`` loops, True as
``lax.associative_scan`` trees. Measured on TPU v5e (B=64, T=100, d=10,
full SVI step, statically-unrolled small-matrix linalg): sequential
compiles in ~5 min and runs 61.9 ms/step; the associative-scan flavor of
the same program compiles for >45 min under XLA:TPU's fusion
cost-estimation on this toolchain (the O(log T)-span tree multiplies the
unrolled combine body across levels and their transposes). The parallel
flavor remains fully tested (equality vs sequential and vs the f64
oracles) and is the right choice for very long T once compile cost
amortizes or the toolchain improves.

  * prefix scan  -> forward filter messages
  * suffix scan  -> backward filter messages (two-filter smoother)
  * prefix[t-1] (+) leaf_t (+) suffix[t+1] -> smoothed pair marginals
  * total element -> log-partition (logZ)
  * smoothed conditionals -> affine recursion x_t = F_t x_{t+1} + g_t,
    itself an associative scan -> O(log T) posterior sampling; the expensive
    (F, f, chol) factors are sample-independent and shared across particles.

Everything is batched (vmap over minibatch / MC particles), statically
shaped, and differentiable; gradient identities
``d logZ / d N1_t = E[x_t x_t^T]``, ``d logZ / d N2_t = E[x_t]``,
``d logZ / d P2_t = E[x_{t+1} x_t^T]`` hold exactly and are used as test
oracles against the closed-form smoother.

Natural-parameter convention: see svae_tpu/ops/__init__.py.
"""

import jax
import jax.numpy as jnp

from svae_tpu.utils import smallchol
from svae_tpu.utils.psd import symmetrize, f32_linalg

# Python float, not jnp: a module-level jnp constant initializes the
# XLA backend at import, which breaks jax.distributed.initialize in
# multi-process programs (it must run before any backend touch).
LOG2PI = 1.8378770664093453


# --------------------------------------------------------------------------
# element algebra
# --------------------------------------------------------------------------


def _solve_and_logdet(M, rhs_mat, rhs_vec):
    """Cholesky-solve M^{-1} rhs_mat, M^{-1} rhs_vec and log|M| in one
    factorization (statically-unrolled small-matrix path,
    svae_tpu/utils/smallchol.py). M is symmetrized first (f32 drift
    mitigation)."""
    L = smallchol.chol(symmetrize(M))
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    sol_mat = smallchol.cho_solve_mat(L, rhs_mat)
    sol_vec = smallchol.cho_solve(L, rhs_vec)
    return sol_mat, sol_vec, logdet


def combine(ea, eb):
    """Associative combine: marginalize the variable shared between block a
    (ending at it) and block b (starting at it). Batched over any leading
    axes (this is what associative_scan vectorizes over)."""
    J11a, J12a, J22a, h1a, h2a, ca = ea
    J11b, J12b, J22b, h1b, h2b, cb = eb
    d = h1a.shape[-1]
    M = J22a + J11b
    b0 = h2a + h1b
    # one cholesky: M^{-1} [J12a^T | J12b | b0]
    rhs = jnp.concatenate([jnp.swapaxes(J12a, -1, -2), J12b], axis=-1)
    sol, Minv_b0, logdetM = _solve_and_logdet(M, rhs, b0)
    Minv_J12aT = sol[..., :d]
    Minv_J12b = sol[..., d:]
    J11 = J11a - J12a @ Minv_J12aT
    J22 = J22b - jnp.swapaxes(J12b, -1, -2) @ Minv_J12b
    J12 = -J12a @ Minv_J12b
    h1 = h1a - (J12a @ Minv_b0[..., None])[..., 0]
    h2 = h2b - (jnp.swapaxes(J12b, -1, -2) @ Minv_b0[..., None])[..., 0]
    c = (
        ca
        + cb
        + 0.5 * d * LOG2PI
        - 0.5 * logdetM
        + 0.5 * jnp.sum(b0 * Minv_b0, axis=-1)
    )
    return (symmetrize(J11), J12, symmetrize(J22), h1, h2, c)


def marginalize_first(e):
    """Integrate out xf -> info-form potential (J, h, c) on xl."""
    J11, J12, J22, h1, h2, c = e
    d = h1.shape[-1]
    Minv_J12, Minv_h1, logdet = _solve_and_logdet(J11, J12, h1)
    J = symmetrize(J22 - jnp.swapaxes(J12, -1, -2) @ Minv_J12)
    h = h2 - (jnp.swapaxes(J12, -1, -2) @ Minv_h1[..., None])[..., 0]
    c = c + 0.5 * d * LOG2PI - 0.5 * logdet + 0.5 * jnp.sum(h1 * Minv_h1, axis=-1)
    return J, h, c


def marginalize_last(e):
    """Integrate out xl -> info-form potential (J, h, c) on xf."""
    J11, J12, J22, h1, h2, c = e
    d = h1.shape[-1]
    Minv_J12T, Minv_h2, logdet = _solve_and_logdet(
        J22, jnp.swapaxes(J12, -1, -2), h2
    )
    J = symmetrize(J11 - J12 @ Minv_J12T)
    h = h1 - (J12 @ Minv_h2[..., None])[..., 0]
    c = c + 0.5 * d * LOG2PI - 0.5 * logdet + 0.5 * jnp.sum(h2 * Minv_h2, axis=-1)
    return J, h, c


def _gauss_logZ_info(J, h, c):
    d = h.shape[-1]
    L = smallchol.chol(symmetrize(J))
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    v = smallchol.cho_solve(L, h)
    return 0.5 * d * LOG2PI - 0.5 * logdet + 0.5 * jnp.sum(h * v, axis=-1) + c


def build_leaves(init, pairs, nodes):
    """Leaf elements, T-1 of them: leaf_t covers pair (x_t, x_{t+1}) and owns
    node_{t+1}; the first leaf additionally owns init + node_1. With this
    ownership the prefix scan's first-marginalized elements are exactly the
    *filtered* potentials alpha_{t+1} (node included), and suffix elements
    carry strictly-future information."""
    I1, I2, Ic = init
    P1, P2, P3, Pc = pairs
    N1, N2 = nodes
    T = N2.shape[0]
    dt = N2.dtype

    first = jnp.zeros((T - 1,), dt).at[0].set(1.0)
    f = first[:, None, None]

    J11 = -2.0 * (P3 + f * (I1 + N1[0]))
    J12 = -jnp.swapaxes(P2, -1, -2)
    J22 = -2.0 * (P1 + N1[1:])
    h1 = first[:, None] * (I2 + N2[0])
    h2 = N2[1:]
    c = Pc + first * Ic
    return (J11, J12, J22, h1, h2, c)


# --------------------------------------------------------------------------
# logZ / filter / smoother
# --------------------------------------------------------------------------
#
# Scan flavors (the ``parallel`` argument everywhere):
#   False  -> lax.scan, O(T) sequential depth (default; fastest compile)
#   True   -> lax.associative_scan, O(log T) span (compiles pathologically
#             on this XLA:TPU toolchain -- header note)
#   int C  -> BLOCKED TWO-PASS scan: split the T-1 leaves into C chunks,
#             combine within chunks as ONE lax.scan vectorized over the
#             chunk axis (depth ceil((T-1)/C)), reduce the C chunk elements
#             with a tiny sequential scan (depth C), then seed every chunk
#             with its global prefix in one batched combine. Sequential
#             depth T/C + C with plain-scan compile cost -- the practical
#             parallel-in-time flavor (temporal parallelization per
#             arXiv:1905.13002 without the associative_scan tree). Any
#             (T, C) works: indivisible lengths are front-padded with
#             masked rows (the chain algebra has no identity element, so
#             pads are skipped with a started-flag masked combine, the same
#             scheme parallel/time_shard.py uses on the mesh).


def _chunked_scan(leaves, C, reverse=False, op2=None):
    """Two-pass prefix (or suffix, ``reverse``) scan of an associative
    algebra (``op2(earlier, later)``; default: the Gaussian chain-element
    ``combine``) over leading-axis-stacked elements.

    Returns ``(total, scans)`` with the full inclusive prefix/suffix
    pytree, shape-compatible with the sequential flavor's output."""
    op2 = combine if op2 is None else op2
    T1 = jax.tree.leaves(leaves)[0].shape[0]
    C = max(1, min(int(C), T1))
    L = -(-T1 // C)  # ceil
    npad = C * L - T1
    # A suffix scan is the prefix scan of the time-flipped leaves with the
    # operands flipped inside the operator (op2(earlier, later) keeps its
    # temporal meaning); flip the result back at the end.
    op = (lambda a, b: op2(b, a)) if reverse else op2
    if reverse:
        leaves = jax.tree.map(lambda a: jnp.flip(a, axis=0), leaves)
    if npad:
        # Front-pad with copies of row 0: values are finite and in-regime
        # (keeps combine internals -- and hence their VJPs -- NaN-free) but
        # are excluded from every combine by the started/ok masks below.
        leaves = jax.tree.map(
            lambda a: jnp.concatenate(
                [jnp.broadcast_to(a[:1], (npad,) + a.shape[1:]), a], axis=0),
            leaves)
    validc = (jnp.arange(C * L) >= npad).reshape(C, L)

    def bwhere(c, x, y):
        # c: (...,) bool mask over the leading axes of pytrees x/y
        return jax.tree.map(
            lambda a, b: jnp.where(
                c.reshape(c.shape + (1,) * (a.ndim - c.ndim)), a, b), x, y)

    def mstep(state, leaf_ok):
        # masked combine: until a valid leaf is absorbed the carry is a pad
        # row, so the first valid leaf REPLACES it; invalid leaves keep the
        # carry unchanged.
        carry, started = state
        leaf, ok = leaf_ok
        new = bwhere(started, op(carry, leaf), leaf)
        out = bwhere(ok, new, carry)
        return (out, started | ok), out

    lc = jax.tree.map(lambda a: a.reshape((C, L) + a.shape[1:]), leaves)
    e0 = jax.tree.map(lambda a: a[:, 0], lc)
    rest = jax.tree.map(lambda a: jnp.moveaxis(a[:, 1:], 1, 0), lc)
    (eC, _), tail = jax.lax.scan(
        mstep, (e0, validc[:, 0]), (rest, jnp.moveaxis(validc[:, 1:], 1, 0)))
    local = jax.tree.map(
        lambda f0, r: jnp.concatenate([f0[:, None], jnp.moveaxis(r, 0, 1)],
                                      axis=1), e0, tail)  # (C, L, ...)

    # chunk-level inclusive reduction (tiny sequential scan over C); with
    # front padding at most the leading chunks are all-pad, their totals
    # masked out the same way
    cvalid = validc.any(axis=1)
    ec0 = jax.tree.map(lambda a: a[0], eC)
    ecrest = jax.tree.map(lambda a: a[1:], eC)

    def mstep1(state, leaf_ok):
        new_state, out = mstep(state, leaf_ok)
        return new_state, new_state  # carry AND its validity flag

    (total, _), (ptail, stail) = jax.lax.scan(
        mstep1, (ec0, cvalid[0]), (ecrest, cvalid[1:]))
    Pincl = jax.tree.map(
        lambda f0, r: jnp.concatenate([f0[None], r], axis=0), ec0, ptail)
    Pvalid = jnp.concatenate([cvalid[:1], stail], axis=0)  # (C,)

    # seed chunks 1.. with the previous chunks' running element (ONE
    # batched combine over (C-1) x L leaves -- no sequential dependency);
    # chunks whose entire prefix is padding keep their local scan
    first = jax.tree.map(lambda a: a[0], local)
    if C > 1:
        Pprev = jax.tree.map(lambda a: jnp.broadcast_to(
            a[:-1, None], (C - 1, L) + a.shape[1:]), Pincl)
        restloc = jax.tree.map(lambda a: a[1:], local)
        seeded = bwhere(Pvalid[:-1, None], op(Pprev, restloc), restloc)
        out = jax.tree.map(
            lambda f, s: jnp.concatenate([f[None], s], axis=0), first,
            seeded)
    else:
        out = jax.tree.map(lambda a: a[None], first)
    out = jax.tree.map(
        lambda a: a.reshape((C * L,) + a.shape[2:])[npad:], out)
    if reverse:
        out = jax.tree.map(lambda a: jnp.flip(a, axis=0), out)
    return total, out


def _total_element(leaves, parallel):
    if parallel is True:
        prefix = jax.lax.associative_scan(combine, leaves, axis=0)
        return jax.tree.map(lambda a: a[-1], prefix), prefix
    elif parallel:  # int chunk count -> blocked two-pass scan
        return _chunked_scan(leaves, parallel)
    else:
        e0 = jax.tree.map(lambda a: a[0], leaves)
        rest = jax.tree.map(lambda a: a[1:], leaves)

        def step(carry, leaf):
            out = combine(carry, leaf)
            return out, out

        total, tail = jax.lax.scan(step, e0, rest)
        prefix = jax.tree.map(
            lambda f0, r: jnp.concatenate([f0[None], r], axis=0), e0, tail
        )
        return total, prefix


@f32_linalg
def lds_logZ(init, pairs, nodes, parallel=False):
    """Log-partition of the chain. Differentiable: grads w.r.t. nodes/pairs
    give the smoothed expected stats (the reference's core contract,
    reference: svae/hmm/hmm_inference.py uses grad(logZ) the same way)."""
    leaves = build_leaves(init, pairs, nodes)
    total, _ = _total_element(leaves, parallel)
    J, h, c = marginalize_first(total)
    return _gauss_logZ_info(J, h, c)


@f32_linalg
def lds_filter(init, pairs, nodes, parallel=False):
    """Forward filter: returns (logZ, Jf, hf) where (Jf[t], hf[t]) is the
    filtered info-form potential on x_t (node_t conditioned), t = 1..T.

    Computed as the prefix scan of chain elements with x_1 marginalized.
    """
    leaves = build_leaves(init, pairs, nodes)
    total, prefix = _total_element(leaves, parallel)
    # prefix[t-1] is a potential over (x_1, x_{t+1}) with nodes 1..t+1
    # consumed; marginalizing x_1 gives the filtered alpha_{t+1}.
    Jp, hp, cp = marginalize_first(prefix)
    # alpha_1 = init + node_1
    J1 = -2.0 * (init[0] + nodes[0][0])
    h1 = init[1] + nodes[1][0]
    Jf = jnp.concatenate([J1[None], Jp], axis=0)
    hf = jnp.concatenate([h1[None], hp], axis=0)
    logZ = _gauss_logZ_info(Jp[-1], hp[-1], cp[-1])
    return logZ, Jf, hf


@f32_linalg
def lds_smoother(init, pairs, nodes, parallel=False):
    """Two-filter parallel smoother.

    Returns ``(logZ, Ex, ExxT, Exnxt)``:
      Ex    (T, d)      = E[x_t]
      ExxT  (T, d, d)   = E[x_t x_t^T]
      Exnxt (T-1, d, d) = E[x_t x_{t+1}^T]
    """
    logZ, Ex, ExxT, Exnxt, _, _ = _smoother_core(init, pairs, nodes,
                                                 parallel)
    return logZ, Ex, ExxT, Exnxt


def _smoother_core(init, pairs, nodes, parallel=False):
    """Smoother body; additionally returns the filtered messages (Jf, hf)
    so ``lds_inference`` can hand them to the sampler without repeating the
    prefix scan (halves the scan work of the fused E-step)."""
    leaves = build_leaves(init, pairs, nodes)
    total, prefix = _total_element(leaves, parallel)

    if parallel is True:
        # reverse=True applies the operator as fn(later, earlier); flip the
        # operands so suffix[t] = leaf_t (+) leaf_{t+1} (+) ... temporally.
        suffix = jax.lax.associative_scan(
            lambda a, b: combine(b, a), leaves, axis=0, reverse=True
        )
    elif parallel:
        _, suffix = _chunked_scan(leaves, parallel, reverse=True)
    else:
        eT = jax.tree.map(lambda a: a[-1], leaves)
        rest = jax.tree.map(lambda a: a[:-1], leaves)

        def bstep(carry, leaf):
            out = combine(leaf, carry)
            return out, out

        _, body = jax.lax.scan(bstep, eT, rest, reverse=True)
        suffix = jax.tree.map(
            lambda r, e: jnp.concatenate([r, e[None]], axis=0), body, eT
        )
    # XLA:TPU miscompile workaround (observed 2026-08-20, jax 0.9.0 on
    # v5e): when this smoother is vmapped with per-sequence pair
    # potentials built by arithmetic (dummy_blend_pairs -- even with
    # all-ones weights, i.e. bit-identical values), the fusion of the
    # reverse-scan output concat into assemble_moments corrupts the
    # suffix row at t = T-2 (ExxT off by O(1) at exactly that index;
    # CPU, any precision, and the Pallas path are all correct). The
    # barrier blocks that fusion; it is a semantic no-op and costs
    # nothing measurable. Regression-gated on chip by
    # benchmarks/onchip_parity.py's ragged section.
    suffix = jax.lax.optimization_barrier(suffix)
    return assemble_moments(init, pairs, nodes, total, prefix, suffix)


def assemble_moments(init, pairs, nodes, total, prefix, suffix):
    """Smoothed moments from the chain-element scans: given the total
    element plus the inclusive prefix/suffix element trees (any scan
    flavor, including the chunked Pallas deployment in
    svae_tpu/ops/pallas_chunked.py), assemble
    ``(logZ, Ex, ExxT, Exnxt, Jf, hf)`` -- pure batched XLA."""
    N1, N2 = nodes
    T, d = N2.shape
    logZ = _gauss_logZ_info(*marginalize_first(total))

    # Forward filtered messages alpha_t (nodes 1..t consumed):
    # alpha_1 = init + node_1 explicitly, alpha_{t+1} = prefix[t-1] with x_1
    # marginalized (new-ownership leaves make this exact).
    Jg_f, hg_f, _ = marginalize_first(prefix)
    J1 = (-2.0 * (init[0] + N1[0]))[None]
    h1f = (init[1] + N2[0])[None]
    Jf = jnp.concatenate([J1, Jg_f], axis=0)  # (T, d, d)
    hf = jnp.concatenate([h1f, hg_f], axis=0)

    # Backward messages beta_t = strictly-future info (pairs t..T-1, nodes
    # t+1..T): suffix[t] with x_T marginalized, for t = 2..T-1; zero at t=T.
    # suffix[1] additionally contains init+node_1 (leaf_1 owns them) -- it is
    # not used: q(x_1) = alpha_1 + (marg_last(suffix[1]) - alpha_1 potential)
    # == marg_last(suffix[1]) directly handled by subtracting alpha_1 below.
    Jg_b, hg_b, _ = marginalize_last(suffix)
    zero_J = jnp.zeros((1, d, d), N2.dtype)
    zero_h = jnp.zeros((1, d), N2.dtype)
    Jb0 = (Jg_b[0] - Jf[0])[None]  # strip the init+node_1 the first leaf owns
    hb0 = (hg_b[0] - hf[0])[None]
    Jb = jnp.concatenate([Jb0, Jg_b[1:], zero_J], axis=0)  # (T, d, d)
    hb = jnp.concatenate([hb0, hg_b[1:], zero_h], axis=0)

    # Smoothed node marginals: q(x_t) proportional to alpha_t * beta_t.
    Js = Jf + Jb
    hs = hf + hb
    Sig = _inv_psd_batched(Js)
    Ex = jnp.einsum("tij,tj->ti", Sig, hs)
    ExxT = symmetrize(Sig + Ex[..., :, None] * Ex[..., None, :])

    # Smoothed pair marginals over (x_t, x_{t+1}), t = 1..T-1:
    #   alpha_t(x_t) + pure pair potential + node_{t+1} + beta_{t+1}(x_{t+1})
    P1, P2, P3, _ = pairs
    J12l = -jnp.swapaxes(P2, -1, -2)
    J11 = -2.0 * P3 + Jf[:-1]
    J22 = -2.0 * (P1 + N1[1:]) + Jb[1:]
    h1 = hf[:-1]
    h2 = N2[1:] + hb[1:]
    # cross-covariance from the 2d x 2d joint:
    #   Cov = [[J11, J12],[J12^T, J22]]^{-1};  Cov_12 = -J11^{-1} J12 S^{-1}
    # with S = J22 - J12^T J11^{-1} J12  (Schur complement).
    J11inv_J12 = _solve_psd_batched(J11, J12l)
    S = J22 - jnp.swapaxes(J12l, -1, -2) @ J11inv_J12
    Sinv = _inv_psd_batched(S)
    Cov12 = -J11inv_J12 @ Sinv
    # means are the smoothed means
    Exnxt = Cov12 + Ex[:-1, :, None] * Ex[1:, None, :]
    return logZ, Ex, ExxT, Exnxt, Jf, hf


def _inv_psd_batched(a):
    L = smallchol.chol(symmetrize(a))
    eye = jnp.broadcast_to(jnp.eye(a.shape[-1], dtype=a.dtype), a.shape)
    return smallchol.cho_solve_mat(L, eye)


def _solve_psd_batched(a, b):
    L = smallchol.chol(symmetrize(a))
    return smallchol.cho_solve_mat(L, b)


# --------------------------------------------------------------------------
# posterior sampling (parallel affine scan)
# --------------------------------------------------------------------------


@f32_linalg
def lds_sample(init, pairs, nodes, key, num_samples, parallel=False,
               filtered=None):
    """Reparameterized joint posterior samples, shape (num_samples, T, d).

    Backward conditionals x_t | x_{t+1} ~ N(F_t x_{t+1} + f_t, C_t) are
    derived from the forward filter; the recursion is evaluated as an
    associative scan of affine maps. (F, f, chol(C)) are shared across
    particles -- only the noise differs -- so extra samples cost one cheap
    batched affine scan each. Pass ``filtered=(Jf, hf)`` (from the
    smoother/filter) to skip recomputing the prefix scan. (reference:
    svae/lds/lds_inference.py:natural_sample_backward_general)
    """
    N1, N2 = nodes
    T, d = N2.shape
    dt = N2.dtype
    if filtered is None:
        _, Jf, hf = lds_filter(init, pairs, nodes, parallel=parallel)
    else:
        Jf, hf = filtered
    P1, P2, P3, Pc = pairs

    # conditional potential on x_t given x_{t+1}:
    #   alpha_t(x_t) + pair_t: precision Jc = Jf[t] - 2 P3_t,
    #   linear h = hf[t] + P2_t^T x_{t+1}
    Jc = Jf[:-1] - 2.0 * P3  # (T-1, d, d)
    Lc = smallchol.chol(symmetrize(Jc))
    F = smallchol.cho_solve_mat(Lc, jnp.swapaxes(P2, -1, -2))  # Jc^{-1} P2^T
    f = smallchol.cho_solve(Lc, hf[:-1])
    # terminal: x_T ~ N(JT^{-1} hT, JT^{-1})
    LT = smallchol.chol(symmetrize(Jf[-1]))
    muT = smallchol.cho_solve(LT, hf[-1])

    if isinstance(num_samples, int):
        num_samples = (num_samples,)
    eps = jax.random.normal(key, tuple(num_samples) + (T, d), dtype=dt)

    # noise terms: n_t = Lc_t^{-T} eps_t (t < T), x_T = muT + LT^{-T} eps_T
    def white(L, e):
        return smallchol.solve_upper_from_lower(L, e)

    xT = muT + white(LT, eps[..., T - 1, :])
    g = f + white(Lc, eps[..., : T - 1, :])  # (..., T-1, d)

    # x_t = F_t x_{t+1} + g_t, downward from t = T-1.
    # compose affine maps in reverse scan: (F, g) pairs.
    def affine_combine(b, a):
        # a after b in recursion order... composition: applying to x_{t+1}:
        # elements ordered by t; combine(e_t, e_{t+1}) must represent
        # x_t as a function of x_{t+2}: x_t = F_t (F_{t+1} x + g_{t+1}) + g_t
        Fb, gb = b
        Fa, ga = a
        return (Fb @ Fa, (Fb @ ga[..., None])[..., 0] + gb)

    Fb = jnp.broadcast_to(F, g.shape[:-1] + (d, d))
    time_axis = g.ndim - 2  # same positive index for both leaves
    if parallel is True:
        # suffix scan (reverse): res[t] maps x_T -> x_t. reverse=True calls
        # the operator as fn(later, earlier); we need earlier as the outer
        # map, so flip the operands.
        Fcum, gcum = jax.lax.associative_scan(
            lambda a, b: affine_combine(b, a), (Fb, g), axis=time_axis, reverse=True
        )
        xs = (Fcum @ xT[..., None, :, None])[..., 0] + gcum
    elif parallel:
        # blocked two-pass suffix composition of the affine maps
        # (affine_combine(earlier, later): earlier is the outer map)
        FbT = jnp.moveaxis(Fb, time_axis, 0)
        gT = jnp.moveaxis(g, time_axis, 0)
        _, (FcumT, gcumT) = _chunked_scan((FbT, gT), parallel,
                                          reverse=True, op2=affine_combine)
        Fcum = jnp.moveaxis(FcumT, 0, time_axis)
        gcum = jnp.moveaxis(gcumT, 0, time_axis)
        xs = (Fcum @ xT[..., None, :, None])[..., 0] + gcum
    else:
        def step(carry, Fg):
            Ft, gt = Fg
            x = (Ft @ carry[..., None])[..., 0] + gt
            return x, x

        FbT = jnp.moveaxis(Fb, time_axis, 0)
        gT = jnp.moveaxis(g, time_axis, 0)
        _, xs_t = jax.lax.scan(step, xT, (FbT, gT), reverse=True)
        xs = jnp.moveaxis(xs_t, 0, -2)
    return jnp.concatenate([xs, xT[..., None, :]], axis=-2)


# --------------------------------------------------------------------------
# fused E-step entry point
# --------------------------------------------------------------------------


@f32_linalg
def lds_inference(init, pairs, nodes, key, num_samples, parallel=False):
    """Full LDS E-step: (samples, (Ex, ExxT, Exnxt), logZ).

    The smoothed stats feed the natural gradient (detached by the caller);
    the samples carry the reparameterization gradient. The sampler reuses
    the smoother's filtered messages -- one prefix scan total.
    (reference: svae/lds/lds_inference.py:natural_lds_inference_general)
    """
    logZ, Ex, ExxT, Exnxt, Jf, hf = _smoother_core(init, pairs, nodes,
                                                   parallel=parallel)
    samples = lds_sample(init, pairs, nodes, key, num_samples,
                         parallel=parallel, filtered=(Jf, hf))
    return samples, (Ex, ExxT, Exnxt), logZ
