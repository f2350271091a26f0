"""Fused differentiable Pallas HMM forward-backward kernel.

TPU-native counterpart of the reference's native HMM inference
(reference: svae/hmm/cython_hmm_inference.pyx -- the Cython fast path
serving the SLDS structured mean-field inner loop; SURVEY.md section 2
#18, section 3.3). One Pallas kernel pass computes BOTH log-space
message recursions -- the ascending alpha filter and the descending beta
filter are independent, so they interleave in a single grid pass with
opposite per-operand index maps (the same fusion argument as
``pallas_vjp._fb_fwd_kernel``). A hand-derived softmax-weighted adjoint
kernel (also fused, mixed-direction) registers as ``jax.custom_vjp``, so
the SLDS z-step differentiates without XLA tracing a backward scan.

Layout: batch on the 128-lane axis, the K discrete states (and the K*K
chain-element entries, row-major) on sublanes. Chain elements stream per
(t, lane):  M_t(i, j) = log_trans(i, j) + log_obs_{t+1}(j).

Recursions (per lane):
  alpha_{t+1}(j) = logsumexp_i  alpha_t(i) + M_t(i, j)        (ascending)
  beta_t(i)      = logsumexp_j  M_t(i, j)  + beta_{t+1}(j)    (descending)

Adjoint (exact, per step; weights are the posterior softmax weights so
every intermediate is bounded in [0, 1]):
  forward:  w_ij = exp(alpha_t(i) + M_t(i,j) - alpha_{t+1}(j))
            dM_t(i,j)   += g_j w_ij ,   dalpha_t(i) = sum_j g_j w_ij
            with g = dalpha_{t+1} (carry + direct cotangent)
  backward: v_ij = exp(M_t(i,j) + beta_{t+1}(j) - beta_t(i))
            dM_t(i,j)   += g_i v_ij ,   dbeta_{t+1}(j) = sum_i g_i v_ij
"""

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jax.scipy.special import logsumexp


def _rows(ref_slice, n):
    return [ref_slice[i] for i in range(n)]


# ==========================================================================
# fused forward kernel (alpha ascending + beta descending, one pass)
# ==========================================================================


def _hmm_fb_kernel(a0, Ma, Md, alpha_out, beta_out, a_s, b_s, *,
                   K, U, T1, G):
    i = pl.program_id(0)  # alpha block i (asc); beta block G-1-i (desc)
    KK = K * K
    masked = (T1 % U) != 0

    @pl.when(i == 0)
    def _():
        a_s[:] = a0[:]
        b_s[:] = jnp.zeros_like(b_s)

    a = _rows(a_s[:], K)
    bt = _rows(b_s[:], K)
    for u in range(U):
        # ---- alpha step at t = i*U + u (ascending) ----
        m = _rows(Ma[u], KK)
        new_a = []
        for j in range(K):
            vals = [a[ii] + m[ii * K + j] for ii in range(K)]
            mx = functools.reduce(jnp.maximum, vals)
            s = sum(jnp.exp(v - mx) for v in vals)
            new_a.append(jnp.log(s) + mx)
        if masked:
            # pads sit at the tail of the ascending sweep; the carry must
            # hold the true alpha_{T1} for nothing (outputs past T1 are
            # sliced off) but must stay finite -- freeze it instead.
            live = i * U + u < T1
            a = [jnp.where(live, x, y) for x, y in zip(new_a, a)]
        else:
            a = new_a
        alpha_out[u, :, :] = jnp.stack(a, axis=0)

        # ---- beta step at t = (G-1-i)*U + (U-1-u) (descending) ----
        ub = U - 1 - u
        md = _rows(Md[ub], KK)
        new_b = []
        for ii in range(K):
            vals = [md[ii * K + j] + bt[j] for j in range(K)]
            mx = functools.reduce(jnp.maximum, vals)
            s = sum(jnp.exp(v - mx) for v in vals)
            new_b.append(jnp.log(s) + mx)
        if masked:
            # the descending sweep meets the zero pads FIRST: the terminal
            # beta = 0 carry must ride through them untouched.
            live = (G - 1 - i) * U + ub < T1
            bt = [jnp.where(live, x, y) for x, y in zip(new_b, bt)]
        else:
            bt = new_b
        beta_out[ub, :, :] = jnp.stack(bt, axis=0)

    a_s[:] = jnp.stack(a, axis=0)
    b_s[:] = jnp.stack(bt, axis=0)


# ==========================================================================
# stationary-transition variant: K-vector streams, whole-operand LT
# ==========================================================================


def _hmm_fb_stat_kernel(a0, LT, loa, lod, alpha_out, beta_out, a_s, b_s, *,
                        K, U, T1, G):
    """Stationary-transition twin of :func:`_hmm_fb_kernel`: the (K, K)
    log-transition matrix rides VMEM as a whole operand and only the
    K-vector observation streams are fetched per step -- K-times less
    stream traffic and NO (B, T-1, K, K) chain-element materialization /
    packing in XLA (the Kalman pipeline's whole-operand trick,
    ops/pallas_estep.py; round-4 DESIGN.md listed this as noted-untaken).

      alpha_{t+1}(j) = lo_{t+1}(j) + logsumexp_i  alpha_t(i) + LT(i, j)
      beta_t(i)      = logsumexp_j  LT(i, j) + lo_{t+1}(j) + beta_{t+1}(j)
    """
    i = pl.program_id(0)
    KK = K * K
    masked = (T1 % U) != 0

    @pl.when(i == 0)
    def _():
        a_s[:] = a0[:]
        b_s[:] = jnp.zeros_like(b_s)

    lt = _rows(LT[:], KK)
    a = _rows(a_s[:], K)
    bt = _rows(b_s[:], K)
    for u in range(U):
        # ---- alpha step at t = i*U + u (ascending) ----
        # (lt + lo) is formed FIRST so the op order -- and hence f32
        # rounding -- is bit-identical to the streamed-M kernel and the
        # XLA path, which precompute M = lt + lo
        lo_a = _rows(loa[u], K)
        new_a = []
        for j in range(K):
            vals = [a[ii] + (lt[ii * K + j] + lo_a[j]) for ii in range(K)]
            mx = functools.reduce(jnp.maximum, vals)
            s = sum(jnp.exp(v - mx) for v in vals)
            new_a.append(jnp.log(s) + mx)
        if masked:
            live = i * U + u < T1
            a = [jnp.where(live, x, y) for x, y in zip(new_a, a)]
        else:
            a = new_a
        alpha_out[u, :, :] = jnp.stack(a, axis=0)

        # ---- beta step at t = (G-1-i)*U + (U-1-u) (descending) ----
        ub = U - 1 - u
        lo_d = _rows(lod[ub], K)
        new_b = []
        for ii in range(K):
            vals = [(lt[ii * K + j] + lo_d[j]) + bt[j] for j in range(K)]
            mx = functools.reduce(jnp.maximum, vals)
            s = sum(jnp.exp(v - mx) for v in vals)
            new_b.append(jnp.log(s) + mx)
        if masked:
            live = (G - 1 - i) * U + ub < T1
            bt = [jnp.where(live, x, y) for x, y in zip(new_b, bt)]
        else:
            bt = new_b
        beta_out[ub, :, :] = jnp.stack(bt, axis=0)

    a_s[:] = jnp.stack(a, axis=0)
    b_s[:] = jnp.stack(bt, axis=0)


def _hmm_fb_stat_adj_kernel(LT, lodn, apd, and_, dad, loan, bta, bna, dba,
                            dloa_out, dlod_out, da0_out, dLT_out,
                            ca, cb, lacc, *, K, U, T1, G):
    """Stationary adjoint. The chain-element cotangent dM_t(i,j)
    decomposes exactly: the observation stream picks up its row sums
    (alpha half: sum_i w_ij = 1 makes dlo_{t+1} = g verbatim; beta half:
    dlo_{t+1}(j) = sum_i gb_i v_ij = the new carry), and the stationary
    LT accumulates ALL of dM in a VMEM scratch across the sweep -- so no
    (T, K*K) cotangent stream is ever written."""
    s = pl.program_id(0)
    KK = K * K
    masked = (T1 % U) != 0

    @pl.when(s == 0)
    def _():
        ca[:] = jnp.zeros_like(ca)
        cb[:] = jnp.zeros_like(cb)
        lacc[:] = jnp.zeros_like(lacc)

    lt = _rows(LT[:], KK)
    gc = _rows(ca[:], K)
    hc = _rows(cb[:], K)
    dlt = _rows(lacc[:], KK)
    for u in range(U):
        # ---- alpha adjoint at t = (G-1-s)*U + (U-1-u) (descending) ----
        uf = U - 1 - u
        g = [x + y for x, y in zip(gc, _rows(dad[uf], K))]
        if masked:
            # gate the whole incoming cotangent at tail-pad rows: the
            # dLT reduction must not absorb pad contributions, and the
            # zero carry rides through the pads it meets first
            live = (G - 1 - s) * U + uf < T1
            g = [jnp.where(live, x, 0.0) for x in g]
        ap = _rows(apd[uf], K)
        an = _rows(and_[uf], K)
        lo = _rows(lodn[uf], K)
        newg = [jnp.zeros_like(g[0]) for _ in range(K)]
        for ii in range(K):
            for j in range(K):
                w = jnp.exp(ap[ii] + (lt[ii * K + j] + lo[j]) - an[j])
                contrib = g[j] * w
                newg[ii] = newg[ii] + contrib
                dlt[ii * K + j] = dlt[ii * K + j] + contrib
        dloa_out[uf, :, :] = jnp.stack(g, axis=0)
        if masked:
            gc = [jnp.where(live, x, y) for x, y in zip(newg, gc)]
        else:
            gc = newg

        # ---- beta adjoint at t = s*U + u (ascending) ----
        gb = [x + y for x, y in zip(hc, _rows(dba[u], K))]
        if masked:
            # ascending: pads come LAST, when the carry is live -- the
            # gate here is what keeps pad rows out of the dLT reduction
            live_b = s * U + u < T1
            gb = [jnp.where(live_b, x, 0.0) for x in gb]
        btv = _rows(bta[u], K)
        bnv = _rows(bna[u], K)
        lo2 = _rows(loan[u], K)
        newh = [jnp.zeros_like(gb[0]) for _ in range(K)]
        for ii in range(K):
            for j in range(K):
                v = jnp.exp((lt[ii * K + j] + lo2[j]) + bnv[j] - btv[ii])
                contrib = gb[ii] * v
                newh[j] = newh[j] + contrib
                dlt[ii * K + j] = dlt[ii * K + j] + contrib
        dlod_out[u, :, :] = jnp.stack(newh, axis=0)
        if masked:
            hc = [jnp.where(live_b, x, y) for x, y in zip(newh, hc)]
        else:
            hc = newh

    ca[:] = jnp.stack(gc, axis=0)
    cb[:] = jnp.stack(hc, axis=0)
    lacc[:] = jnp.stack(dlt, axis=0)
    da0_out[:] = ca[:]
    dLT_out[:] = lacc[:]


# ==========================================================================
# fused adjoint kernel (alpha-adjoint descending + beta-adjoint ascending)
# ==========================================================================


def _hmm_fb_adj_kernel(Md, apd, and_, dad, Ma, bta, bna, dba,
                       dMf_out, dMb_out, da0_out, ca, cb, *,
                       K, U, T1, G):
    s = pl.program_id(0)
    KK = K * K
    masked = (T1 % U) != 0

    @pl.when(s == 0)
    def _():
        ca[:] = jnp.zeros_like(ca)
        cb[:] = jnp.zeros_like(cb)

    gc = _rows(ca[:], K)
    hc = _rows(cb[:], K)
    for u in range(U):
        # ---- alpha adjoint at t = (G-1-s)*U + (U-1-u) (descending) ----
        uf = U - 1 - u
        g = [x + y for x, y in zip(gc, _rows(dad[uf], K))]
        m = _rows(Md[uf], KK)
        ap = _rows(apd[uf], K)   # alpha_t
        an = _rows(and_[uf], K)  # alpha_{t+1}
        dM = []
        newg = [jnp.zeros_like(g[0]) for _ in range(K)]
        for ii in range(K):
            row = []
            for j in range(K):
                w = jnp.exp(ap[ii] + m[ii * K + j] - an[j])
                contrib = g[j] * w
                row.append(contrib)
                newg[ii] = newg[ii] + contrib
            dM.extend(row)
        dMf_out[uf, :, :] = jnp.stack(dM, axis=0)
        if masked:
            live = (G - 1 - s) * U + uf < T1
            gc = [jnp.where(live, x, y) for x, y in zip(newg, gc)]
        else:
            gc = newg

        # ---- beta adjoint at t = s*U + u (ascending) ----
        gb = [x + y for x, y in zip(hc, _rows(dba[u], K))]
        ma = _rows(Ma[u], KK)
        btv = _rows(bta[u], K)  # beta_t
        bnv = _rows(bna[u], K)  # beta_{t+1}
        dMb = []
        newh = [jnp.zeros_like(gb[0]) for _ in range(K)]
        for ii in range(K):
            row = []
            for j in range(K):
                v = jnp.exp(ma[ii * K + j] + bnv[j] - btv[ii])
                contrib = gb[ii] * v
                row.append(contrib)
                newh[j] = newh[j] + contrib
            dMb.extend(row)
        dMb_out[u, :, :] = jnp.stack(dMb, axis=0)
        if masked:
            # ascending: pads come last; freeze so da0 (read at the very
            # end, i.e. never -- the beta chain has no initial-state input)
            # stays clean. Only dMb rows past T1 are garbage and sliced.
            live = s * U + u < T1
            hc = [jnp.where(live, x, y) for x, y in zip(newh, hc)]
        else:
            hc = newh

    ca[:] = jnp.stack(gc, axis=0)
    cb[:] = jnp.stack(hc, axis=0)
    da0_out[:] = ca[:]


# ==========================================================================
# pallas_call plumbing
# ==========================================================================

_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _blk(U, m, Bp, rev=None):
    if rev is None:
        return pl.BlockSpec((U, m, Bp), lambda s: (s, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((U, m, Bp), lambda s: (rev - s, 0, 0),
                        memory_space=pltpu.VMEM)


def _whole():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _grid_of(T1, U):
    G = -(-T1 // U)
    return G, G * U


def _pad_time(x, Tp):
    T1 = x.shape[0]
    if Tp == T1:
        return x
    z = jnp.zeros((Tp - T1,) + x.shape[1:], x.dtype)
    return jnp.concatenate([x, z], axis=0)


def _fb_call(a0, M, *, K, U, interpret):
    T1, KK, Bp = M.shape
    dt = a0.dtype
    G, Tp = _grid_of(T1, U)
    r = G - 1
    M = _pad_time(M, Tp)
    alpha, beta = pl.pallas_call(
        functools.partial(_hmm_fb_kernel, K=K, U=U, T1=T1, G=G),
        grid=(G,),
        in_specs=[_whole(), _blk(U, KK, Bp), _blk(U, KK, Bp, r)],
        out_specs=[_blk(U, K, Bp), _blk(U, K, Bp, r)],
        out_shape=[jax.ShapeDtypeStruct((Tp, K, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, K, Bp), dt)],
        scratch_shapes=[pltpu.VMEM((K, Bp), dt), pltpu.VMEM((K, Bp), dt)],
        compiler_params=_PARAMS,
        interpret=interpret,
    )(a0, M, M)
    return alpha[:T1], beta[:T1]


def _fb_stat_call(a0, LT, lo, *, K, U, interpret):
    T1, _, Bp = lo.shape
    dt = a0.dtype
    G, Tp = _grid_of(T1, U)
    r = G - 1
    lo = _pad_time(lo, Tp)
    alpha, beta = pl.pallas_call(
        functools.partial(_hmm_fb_stat_kernel, K=K, U=U, T1=T1, G=G),
        grid=(G,),
        in_specs=[_whole(), _whole(), _blk(U, K, Bp), _blk(U, K, Bp, r)],
        out_specs=[_blk(U, K, Bp), _blk(U, K, Bp, r)],
        out_shape=[jax.ShapeDtypeStruct((Tp, K, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, K, Bp), dt)],
        scratch_shapes=[pltpu.VMEM((K, Bp), dt), pltpu.VMEM((K, Bp), dt)],
        compiler_params=_PARAMS,
        interpret=interpret,
    )(a0, LT, lo, lo)
    return alpha[:T1], beta[:T1]


def _fb_stat_adj_call(LT, lo, ap, an, da, bt, bn, db, *, K, U, interpret):
    T1, _, Bp = lo.shape
    KK = K * K
    dt = ap.dtype
    G, Tp = _grid_of(T1, U)
    r = G - 1
    lo, ap, an, da, bt, bn, db = (
        _pad_time(x, Tp) for x in (lo, ap, an, da, bt, bn, db))
    dloa, dlod, da0, dLT = pl.pallas_call(
        functools.partial(_hmm_fb_stat_adj_kernel, K=K, U=U, T1=T1, G=G),
        grid=(G,),
        in_specs=[_whole(), _blk(U, K, Bp, r), _blk(U, K, Bp, r),
                  _blk(U, K, Bp, r), _blk(U, K, Bp, r),
                  _blk(U, K, Bp), _blk(U, K, Bp), _blk(U, K, Bp),
                  _blk(U, K, Bp)],
        out_specs=[_blk(U, K, Bp, r), _blk(U, K, Bp), _whole(), _whole()],
        out_shape=[jax.ShapeDtypeStruct((Tp, K, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, K, Bp), dt),
                   jax.ShapeDtypeStruct((K, Bp), dt),
                   jax.ShapeDtypeStruct((KK, Bp), dt)],
        scratch_shapes=[pltpu.VMEM((K, Bp), dt), pltpu.VMEM((K, Bp), dt),
                        pltpu.VMEM((KK, Bp), dt)],
        compiler_params=_PARAMS,
        interpret=interpret,
    )(LT, lo, ap, an, da, lo, bt, bn, db)
    return dloa[:T1], dlod[:T1], da0, dLT


def _fb_adj_call(M, ap, an, da, bt, bn, db, *, K, U, interpret):
    T1, KK, Bp = M.shape
    dt = ap.dtype
    G, Tp = _grid_of(T1, U)
    r = G - 1
    M, ap, an, da, bt, bn, db = (
        _pad_time(x, Tp) for x in (M, ap, an, da, bt, bn, db))
    dMf, dMb, da0 = pl.pallas_call(
        functools.partial(_hmm_fb_adj_kernel, K=K, U=U, T1=T1, G=G),
        grid=(G,),
        in_specs=[_blk(U, KK, Bp, r), _blk(U, K, Bp, r),
                  _blk(U, K, Bp, r), _blk(U, K, Bp, r),
                  _blk(U, KK, Bp), _blk(U, K, Bp), _blk(U, K, Bp),
                  _blk(U, K, Bp)],
        out_specs=[_blk(U, KK, Bp, r), _blk(U, KK, Bp), _whole()],
        out_shape=[jax.ShapeDtypeStruct((Tp, KK, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, KK, Bp), dt),
                   jax.ShapeDtypeStruct((K, Bp), dt)],
        scratch_shapes=[pltpu.VMEM((K, Bp), dt), pltpu.VMEM((K, Bp), dt)],
        compiler_params=_PARAMS,
        interpret=interpret,
    )(M, ap, an, da, M, bt, bn, db)
    return dMf[:T1], dMb[:T1], da0


# ==========================================================================
# custom-VJP primitive (packed layout)
# ==========================================================================

# Per-step HMM work is a handful of VPU logsumexps (no linalg), so the
# per-grid-step overhead matters more than for the Kalman kernels; a
# moderate time unroll amortizes it. Tuned on-chip (see BASELINE.md).
DEFAULT_UNROLL = 4


def _resolve_unroll(interpret, unroll):
    if unroll is not None:
        return max(1, int(unroll))
    return 1 if interpret else DEFAULT_UNROLL


@functools.lru_cache(maxsize=8)
def _prim(K, interpret, U):
    @jax.custom_vjp
    def fb(a0, M):
        return _fb_call(a0, M, K=K, U=U, interpret=interpret)

    def fb_fwd(a0, M):
        alpha, beta = _fb_call(a0, M, K=K, U=U, interpret=interpret)
        ap = jnp.concatenate([a0[None], alpha[:-1]], axis=0)  # alpha_t
        z = jnp.zeros_like(beta[:1])
        bn = jnp.concatenate([beta[1:], z], axis=0)           # beta_{t+1}
        return (alpha, beta), (M, ap, alpha, beta, bn)

    def fb_bwd(res, cots):
        M, ap, alpha, beta, bn = res
        da, db = cots
        dMf, dMb, da0 = _fb_adj_call(M, ap, alpha, da, beta, bn, db,
                                     K=K, U=U, interpret=interpret)
        return da0, dMf + dMb

    fb.defvjp(fb_fwd, fb_bwd)
    return fb


@functools.lru_cache(maxsize=8)
def _stat_prim(K, interpret, U):
    """Stationary-transition primitive over ``(a0, LT, lo)`` with LT a
    lane-broadcast (K*K, Bp) whole operand and ``lo`` the (T-1, K, Bp)
    observation stream for frames 1..T-1. The LT cotangent comes back
    per-lane (the sweep-accumulated VMEM scratch); the caller's
    broadcast transpose sums it over lanes."""

    @jax.custom_vjp
    def fb(a0, LT, lo):
        return _fb_stat_call(a0, LT, lo, K=K, U=U, interpret=interpret)

    def fb_fwd(a0, LT, lo):
        alpha, beta = _fb_stat_call(a0, LT, lo, K=K, U=U,
                                    interpret=interpret)
        ap = jnp.concatenate([a0[None], alpha[:-1]], axis=0)
        z = jnp.zeros_like(beta[:1])
        bn = jnp.concatenate([beta[1:], z], axis=0)
        return (alpha, beta), (LT, lo, ap, alpha, beta, bn)

    def fb_bwd(res, cots):
        LT, lo, ap, alpha, beta, bn = res
        da, db = cots
        dloa, dlod, da0, dLT = _fb_stat_adj_call(
            LT, lo, ap, alpha, da, beta, bn, db, K=K, U=U,
            interpret=interpret)
        return da0, dLT, dloa + dlod

    fb.defvjp(fb_fwd, fb_bwd)
    return fb


# ==========================================================================
# public batched entry point
# ==========================================================================


def _pack(x, m):
    """(Bp, T, ...) -> (T, m, Bp)."""
    Bp, T = x.shape[:2]
    return jnp.moveaxis(x.reshape(Bp, T, m), 0, -1)


def _unpack(x, shape_tail):
    T, m, Bp = x.shape
    return jnp.moveaxis(x, -1, 0).reshape((Bp, T) + shape_tail)


def hmm_posterior(log_init, log_trans, log_obs, block_b=128,
                  interpret=False, unroll=None, pair_weights=None,
                  kernel="auto"):
    """Batched fused-kernel forward-backward posterior, the drop-in
    batched counterpart of ``ops.hmm.hmm_posterior`` (parity-tested):
    ``(logZ (B,), node (B,T,K), pair_sum (B,K,K), init_marginal (B,K))``.

    ``log_init`` (K,), ``log_trans`` (K,K) broadcast over the batch --
    or (B, T-1, K, K) per-sequence time-varying (the ragged-batch path:
    pad transitions carry a normalized uniform dummy); ``log_obs`` is
    (B, T, K). ``pair_weights`` (B, T-1) weights the pair-count sum so
    pad transitions drop out of the M-step stat. Fully differentiable:
    alpha/beta carry the hand-derived adjoint kernel (the chain elements
    M are assembled OUTSIDE the custom-VJP primitive, so time-varying
    transitions need no kernel change -- jax chains dM back through the
    assembly); the marginal assembly is cheap XLA.

    ``kernel`` selects the message-recursion primitive for STATIONARY
    (2-D) transitions: "streamed" streams full K^2 chain-element blocks
    (XLA pre-adds lt + lo in parallel); "stationary" keeps lt as a whole
    VMEM operand and streams only K-vectors, folding the lt + lo add
    into the serial kernel step. Measured on chip (2026-08-20, B=128
    T=100): at K=8 "streamed" wins (the chain is ISSUE-bound, so the
    K^2 in-kernel adds cost ~26% serial time while the saved stream
    bandwidth was free at ~10% HBM); "auto" therefore resolves to
    "streamed". Time-varying (4-D) transitions always stream. Either
    way, stationary transitions get the pair-marginal MATMUL assembly
    (no (B, T-1, K, K) materialization).
    """
    B, T, K = log_obs.shape
    dt = log_obs.dtype
    log_init = log_init.astype(dt)
    log_trans = log_trans.astype(dt)
    a0 = log_init[None] + log_obs[:, 0]  # (B, K)
    stationary = log_trans.ndim == 2
    if kernel not in ("auto", "streamed", "stationary"):
        raise ValueError(f"kernel must be auto|streamed|stationary, "
                         f"got {kernel!r}")
    if kernel == "stationary" and not stationary:
        # an EXPLICIT fast-path request must not silently degrade
        # (same convention as models.lds.posterior_moments' ragged guard)
        raise ValueError(
            "hmm_posterior(kernel='stationary') requires a stationary "
            "(K, K) log_trans; got time-varying transitions -- use "
            "kernel='auto'/'streamed'")
    if kernel == "auto":
        kernel = "streamed"
    pad = (-B) % block_b
    Bp = B + pad
    U = _resolve_unroll(interpret, unroll)

    if pad:
        a0p = jnp.concatenate([a0, jnp.zeros((pad, K), dt)], axis=0)
    else:
        a0p = a0
    a0f = _pack(a0p[:, None], K)[0]          # (K, Bp)

    if stationary and kernel == "stationary":
        # K-vector streaming path: LT is a whole VMEM operand, only the
        # per-frame observation vectors stream -- no (B, T-1, K, K)
        # chain-element build/pack in XLA at all (but the lt + lo add
        # moves INTO the serial step; see the kernel note above)
        lo_t = log_obs[:, 1:]                # (B, T-1, K)
        if pad:
            lo_t_p = jnp.concatenate(
                [lo_t, jnp.zeros((pad, T - 1, K), dt)], axis=0)
        else:
            lo_t_p = lo_t
        lof = _pack(lo_t_p, K)               # (T-1, K, Bp)
        LTb = jnp.broadcast_to(
            log_trans.reshape(K * K)[:, None], (K * K, Bp))
        alpha_f, beta_f = _stat_prim(K, interpret, U)(a0f, LTb, lof)
    else:
        # stream full chain elements M_t = log_trans_t + log_obs_{t+1}
        # (the lt + lo add is parallel XLA glue, not serial kernel work)
        if stationary:
            M = log_trans[None, None] + log_obs[:, 1:, None, :]
        else:
            M = log_trans + log_obs[:, 1:, None, :]
        if pad:
            Mp = jnp.concatenate(
                [M, jnp.zeros((pad, T - 1, K, K), dt)], axis=0)
        else:
            Mp = M
        Mf = _pack(Mp, K * K)                # (T-1, K*K, Bp)
        alpha_f, beta_f = _prim(K, interpret, U)(a0f, Mf)

    alpha_tail = _unpack(alpha_f, (K,))[:B]  # (B, T-1, K): alpha_{2..T}
    beta_head = _unpack(beta_f, (K,))[:B]    # (B, T-1, K): beta_{1..T-1}
    alpha = jnp.concatenate([a0[:, None], alpha_tail], axis=1)
    beta = jnp.concatenate(
        [beta_head, jnp.zeros((B, 1, K), dt)], axis=1)

    logZ = logsumexp(alpha[:, -1], axis=-1)
    node = jnp.exp(alpha + beta - logZ[:, None, None])
    # pair_t(i,j) = exp(alpha_t(i) + M_t(i,j) + beta_{t+1}(j) - logZ):
    # every exponent is <= ~log T (pair_t is a posterior transition
    # probability), so the materialized form is overflow-proof for ANY
    # transition matrix. A factorized matmul form (pair_sum = exp(LT) o
    # U^T V with per-t shifts) was measured at parity speed-wise but
    # REJECTED for correctness: when a strongly-disfavored transition
    # (LT entry ~ -100, e.g. digamma expected-stats of a sparse
    # Dirichlet) is forced by the observations, the true pair count is
    # O(1) while exp(LT) underflows and the matmul factor overflows --
    # 0 * inf = NaN in the production SLDS z-step (found in round-5
    # review, reproduced at K=2).
    if stationary and kernel == "stationary":
        # the stationary prim never built M; the pair marginal needs it
        M = log_trans[None, None] + log_obs[:, 1:, None, :]
    pair = jnp.exp(
        alpha[:, :-1, :, None] + M + beta[:, 1:, None, :]
        - logZ[:, None, None, None]
    )
    if pair_weights is None:
        pair_sum = jnp.sum(pair, axis=1)
    else:
        pair_sum = jnp.einsum(
            "bt,btij->bij", jnp.asarray(pair_weights, pair.dtype), pair)
    return logZ, node, pair_sum, node[:, 0]
