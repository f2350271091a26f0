"""Fully packed stationary-diagonal LDS E-step: the production fast path
for the flagship LDS-SVAE config.

Why this module exists. Profiling the fused-kernel E-step on chip
(2026-08-20, v5e, B=64 T=100 d=10 f32) showed the Pallas chain kernels
take ~35 us while the WHOLE E-step took ~2 ms: >90% of the time was XLA
*packing glue* -- broadcasting the shared pair potentials into
(T, d*d, 128) streams, flipping/concatenating them, transposing outputs
back to (B, T, d, d) for the moment assembly, then re-packing for the
sampler. For the flagship config all of that movement is avoidable,
because the structure is known:

  * the pair potentials are STATIONARY (one (d, d) matrix per slot,
    time-homogeneous dynamics under q(theta)) -> pass them ONCE as
    VMEM-resident whole operands instead of streaming dense broadcasts;
  * the recognition potentials are DIAGONAL (J_diag, h) -> stream only
    two (d, Bp) lane vectors per step instead of (d*d, Bp) blocks;
  * every downstream consumer is a REDUCTION (NIW/MNIW expected-stat
    sums, the local-KL contraction) or the sampler -- which can consume
    the packed layout directly. Nothing ever needs (B, T, d, d).

The chain kernels use the bidirectional unified-step layout of
svae_tpu/ops/pallas_bidir.py (forward filter on lanes [0, B), the
time-reversed backward filter on lanes [B, 2B); one chain step per grid
step), with the per-lane static offsets (A, C, D) as whole operands and
the diagonal node streams routed per lane half by a lane mask. The
smoothed-moment assembly runs as plain (auto-differentiable) XLA on
row-lists of (T, B) slices of the packed streams -- the same unrolled
small-matrix algebra as the kernels (svae_tpu/ops/rowalg.py works on
arrays of any shape), in a layout XLA tiles well (T x B), instead of
(B, T, d, d) whose trailing 10 x 10 dims waste 92% of every (8, 128)
tile. The backward sampler is the same specialization of the sampler
kernel (whole P2/P3, streamed filter messages + noise).

This is the TPU-native counterpart of the reference's Cython LDS fast
path (reference: svae/lds/cython_lds_inference.pyx; SURVEY.md section 2
#13) specialized to the structure its experiments actually have
(homogeneous dynamics, diagonal recognition evidence -- reference:
svae/recognition_models.py diagonal Gaussian outputs). The generic
layouts (pallas_vjp.py / pallas_bidir.py) remain the path for
per-sequence (ragged, SLDS state-averaged) pair potentials.
"""

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svae_tpu.ops import rowalg as ra
from svae_tpu.ops.pallas_vjp import (
    LOG2PI, _PARAMS, _blk, _whole, _grid_of, _pad_time, _rows, _store_u,
    _resolve_unroll)


# ==========================================================================
# filter kernels (bidirectional unified step, stationary + diagonal nodes)
# ==========================================================================


def _filter_fwd_kernel(J0, h0, Astat, Cstat, Dstat, wfwd, jd, n2,
                       J_out, h_out, ln_out, Js, hs, acc, *, d, U, T1):
    b = pl.program_id(0)
    dd = d * d
    masked = (T1 % U) != 0

    @pl.when(b == 0)
    def _():
        Js[:] = J0[:]
        hs[:] = h0[:]
        acc[:] = jnp.zeros_like(acc)

    Ast = _rows(Astat[:], dd)
    Cst = _rows(Cstat[:], dd)
    Du = _rows(Dstat[:], dd)
    wC = wfwd[0]       # 1.0 on forward lanes
    wA = 1.0 - wC      # 1.0 on backward lanes
    J = _rows(Js[:], dd)
    h = _rows(hs[:], d)
    a = acc[0, :]
    for u in range(U):
        jdr = _rows(jd[u], d)
        n2r = _rows(n2[u], d)
        # diagonal node evidence routes to C on forward lanes (the next
        # node's potential lands in the new marginal) and to A on
        # backward lanes (the reversed recursion absorbs it into M);
        # same routing for the h-side (e fwd / f bwd).
        Au = [Ast[i * d + j] + (jdr[i] * wA if i == j else 0.0)
              for i in range(d) for j in range(d)]
        Cu = [Cst[i * d + j] + (jdr[i] * wC if i == j else 0.0)
              for i in range(d) for j in range(d)]
        fu = [x * wA for x in n2r]
        eu = [x * wC for x in n2r]

        M = ra.add(J, Au)
        L = ra.chol(M, d)
        bvec = ra.add(h, fu)
        v = ra.solve_lower(L, bvec, d)
        inc = (0.5 * d * LOG2PI - 0.5 * ra.logdet_from_chol(L, d)
               + 0.5 * ra.dot(v, v))
        w = ra.solve_upper(L, v, d)
        Minv_DT = ra.solve_upper_mat(
            L, ra.solve_lower_mat(L, ra.transpose(Du, d), d), d)
        J = ra.sub(Cu, ra.matmul(Du, Minv_DT, d))
        h = ra.add(ra.matvec(Du, w, d), eu)
        if masked:
            a = a + jnp.where(b * U + u < T1, inc, 0.0)
        else:
            a = a + inc
        J_out[u, :, :] = jnp.stack(J, axis=0)
        h_out[u, :, :] = jnp.stack(h, axis=0)

    Js[:] = jnp.stack(J, axis=0)
    hs[:] = jnp.stack(h, axis=0)
    acc[0, :] = a
    ln_out[:] = acc[:]


def _filter_adj_kernel(Dstat, wfwd, Jpre, hpre, Astat, jd, n2, dJ, dh, lam,
                       djd_out, dn2_out, dA_out, dC_out, dD_out,
                       dJ0_out, dh0_out, cJ, ch, aA, aC, aD, *, d, U, T1,
                       G_):
    """Unified adjoint, descending in the stream coordinate. Per-row
    operand cotangents (dA_t = Mbar, dC_t = G, dD_t, de_t = g,
    df_t = hbar; pallas_bidir.py docstring) map onto this kernel's
    operands as: whole accumulators dA += Mbar, dC += G, dD += dDu over
    live rows; diagonal streams djd = wC diag(G) + wA diag(Mbar) and
    dn2 = wC g + wA hbar."""
    s = pl.program_id(0)  # fetches block G_-1-s; rows walked u = U-1..0
    dd = d * d
    masked = (T1 % U) != 0

    @pl.when(s == 0)
    def _():
        cJ[:] = jnp.zeros_like(cJ)
        ch[:] = jnp.zeros_like(ch)
        aA[:] = jnp.zeros_like(aA)
        aC[:] = jnp.zeros_like(aC)
        aD[:] = jnp.zeros_like(aD)

    Du = _rows(Dstat[:], dd)
    Ast = _rows(Astat[:], dd)
    wC = wfwd[0]
    wA = 1.0 - wC
    Mc = _rows(cJ[:], dd)
    hc = _rows(ch[:], d)
    accA = _rows(aA[:], dd)
    accC = _rows(aC[:], dd)
    accD = _rows(aD[:], dd)
    for u_i in reversed(range(U)):
        G = ra.add(Mc, _rows(dJ[u_i], dd))
        g = ra.add(hc, _rows(dh[u_i], d))
        jdr = _rows(jd[u_i], d)
        n2r = _rows(n2[u_i], d)
        Jp = _rows(Jpre[u_i], dd)
        hp = _rows(hpre[u_i], d)
        lv = lam[0]

        M = [Jp[i * d + j] + Ast[i * d + j]
             + (jdr[i] * wA if i == j else 0.0)
             for i in range(d) for j in range(d)]
        v = [hp[i] + n2r[i] * wA for i in range(d)]
        L = ra.chol(M, d)
        W = ra.cho_inverse(L, d)
        w = ra.matvec(W, v, d)
        uvec = ra.matvec_T(Du, g, d)
        hbar = [lv * wi + x for wi, x in zip(w, ra.matvec(W, uvec, d))]
        Wbar = ra.add(
            ra.add(ra.scale(ra.matmul(ra.matmul_TN(Du, G, d), Du, d),
                            -1.0),
                   ra.outer(uvec, v, d)),
            [0.5 * lv * e for e in ra.outer(v, v, d)])
        Mbar = ra.sub(
            ra.scale(ra.matmul(ra.matmul(W, Wbar, d), W, d), -1.0),
            [0.5 * lv * e for e in W])
        Mbar = ra.sym(Mbar, d)
        Gsym = ra.add(G, ra.transpose(G, d))
        dDu = ra.add(
            ra.scale(ra.matmul(Gsym, ra.matmul(Du, W, d), d), -1.0),
            ra.outer(g, w, d))

        djd = [wC * G[i * d + i] + wA * Mbar[i * d + i] for i in range(d)]
        dn2 = [wC * gi + wA * hb for gi, hb in zip(g, hbar)]
        _store_u(djd_out, u_i, djd)
        _store_u(dn2_out, u_i, dn2)
        if masked:
            live = (G_ - 1 - s) * U + u_i < T1
            accA = [jnp.where(live, x + y, x) for x, y in zip(accA, Mbar)]
            accC = [jnp.where(live, x + y, x) for x, y in zip(accC, G)]
            accD = [jnp.where(live, x + y, x) for x, y in zip(accD, dDu)]
            Mc = [jnp.where(live, x, y) for x, y in zip(Mbar, Mc)]
            hc = [jnp.where(live, x, y) for x, y in zip(hbar, hc)]
        else:
            accA = ra.add(accA, Mbar)
            accC = ra.add(accC, G)
            accD = ra.add(accD, dDu)
            Mc, hc = Mbar, hbar

    cJ[:] = jnp.stack(Mc, axis=0)
    ch[:] = jnp.stack(hc, axis=0)
    aA[:] = jnp.stack(accA, axis=0)
    aC[:] = jnp.stack(accC, axis=0)
    aD[:] = jnp.stack(accD, axis=0)
    dA_out[:] = aA[:]
    dC_out[:] = aC[:]
    dD_out[:] = aD[:]
    dJ0_out[:] = cJ[:]
    dh0_out[:] = ch[:]


# ==========================================================================
# sampler kernels (stationary pairs as whole operands)
# ==========================================================================


def _sampler_fwd_kernel(P2w, P3w, Jft, hft, epsf, xT, x_out, xs, *, d, U,
                        T1, G):
    s = pl.program_id(0)  # fetches block G-1-s; rows walked u = U-1..0
    dd = d * d
    masked = (T1 % U) != 0

    @pl.when(s == 0)
    def _():
        xs[:] = xT[:]

    p2 = _rows(P2w[:], dd)
    p3 = _rows(P3w[:], dd)
    x = _rows(xs[:], d)
    for u in reversed(range(U)):
        jf = _rows(Jft[u], dd)
        hf = _rows(hft[u], d)
        eps = _rows(epsf[u], d)

        Jc = ra.sub(jf, ra.scale(p3, 2.0))
        L = ra.chol(Jc, d)
        b = ra.add(hf, ra.matvec_T(p2, x, d))
        mu = ra.cho_solve(L, b, d)
        z = ra.solve_upper(L, eps, d)
        newx = ra.add(mu, z)
        if masked:
            live = (G - 1 - s) * U + u < T1
            x = [jnp.where(live, a, c) for a, c in zip(newx, x)]
        else:
            x = newx
        x_out[u, :, :] = jnp.stack(x, axis=0)

    xs[:] = jnp.stack(x, axis=0)


def _sampler_adj_kernel(P2w, P3w, Jft, hft, xb, xnext, dx,
                        dJc_out, dhf_out, dxT_out, dP2_out, cx, aP2, *, d,
                        U, T1):
    t = pl.program_id(0)  # forward in time
    dd = d * d
    masked = (T1 % U) != 0

    @pl.when(t == 0)
    def _():
        cx[:] = jnp.zeros_like(cx)
        aP2[:] = jnp.zeros_like(aP2)

    p2 = _rows(P2w[:], dd)
    p3 = _rows(P3w[:], dd)
    xc = _rows(cx[:], d)
    accP2 = _rows(aP2[:], dd)
    for u_i in range(U):
        xbar = ra.add(xc, _rows(dx[u_i], d))
        jf = _rows(Jft[u_i], dd)
        hf = _rows(hft[u_i], d)
        x_t = _rows(xb[u_i], d)
        x_n = _rows(xnext[u_i], d)

        Jc = ra.sub(jf, ra.scale(p3, 2.0))
        L = ra.chol(Jc, d)
        b = ra.add(hf, ra.matvec_T(p2, x_n, d))
        # two vector cho_solves instead of forming W = Jc^{-1} (d unit
        # solves): W is only ever applied to b and xbar here, and the
        # serialized chain is what this kernel's latency hangs on
        mu = ra.cho_solve(L, b, d)
        z = ra.sub(x_t, mu)
        u = ra.solve_lower(L, xbar, d)
        bbar = ra.solve_upper(L, u, d)  # W xbar, reusing the half-solve
        Lbar = ra.scale(ra.tril(ra.outer(z, u, d), d), -1.0)
        Jc_bar = ra.sym(
            ra.add(ra.scale(ra.outer(bbar, mu, d), -1.0),
                   ra.chol_vjp(L, Lbar, d)), d)
        dP2 = ra.outer(x_n, bbar, d)

        _store_u(dJc_out, u_i, Jc_bar)
        _store_u(dhf_out, u_i, bbar)
        newx = ra.matvec(p2, bbar, d)
        if masked:
            live = t * U + u_i < T1
            accP2 = [jnp.where(live, a + p, a)
                     for a, p in zip(accP2, dP2)]
            xc = [jnp.where(live, a, c) for a, c in zip(newx, xc)]
        else:
            accP2 = ra.add(accP2, dP2)
            xc = newx

    cx[:] = jnp.stack(xc, axis=0)
    aP2[:] = jnp.stack(accP2, axis=0)
    dxT_out[:] = cx[:]
    dP2_out[:] = aP2[:]


# ==========================================================================
# pallas_call plumbing
# ==========================================================================


def _filter_fwd_call(J0, h0, Astat, Cstat, Dstat, wfwd, jd, n2, *, d, U,
                     interpret):
    T1, _, Bp = jd.shape
    dd = d * d
    dt = J0.dtype
    G, Tp = _grid_of(T1, U)
    jd, n2 = _pad_time(jd, Tp), _pad_time(n2, Tp)
    Jr, hr, ln = pl.pallas_call(
        functools.partial(_filter_fwd_kernel, d=d, U=U, T1=T1),
        grid=(G,),
        in_specs=[_whole()] * 6 + [_blk(U, d, Bp), _blk(U, d, Bp)],
        out_specs=[_blk(U, dd, Bp), _blk(U, d, Bp), _whole()],
        out_shape=[jax.ShapeDtypeStruct((Tp, dd, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, d, Bp), dt),
                   jax.ShapeDtypeStruct((1, Bp), dt)],
        scratch_shapes=[pltpu.VMEM((dd, Bp), dt), pltpu.VMEM((d, Bp), dt),
                        pltpu.VMEM((1, Bp), dt)],
        compiler_params=_PARAMS,
        interpret=interpret,
    )(J0, h0, Astat, Cstat, Dstat, wfwd, jd, n2)
    return Jr[:T1], hr[:T1], ln


def _filter_adj_call(Dstat, wfwd, Jpre, hpre, Astat, jd, n2, dJ, dh, lam,
                     *, d, U, interpret):
    T1, dd, Bp = Jpre.shape
    dt = Jpre.dtype
    G, Tp = _grid_of(T1, U)
    r = G - 1
    Jpre, hpre, jd, n2, dJ, dh = (
        _pad_time(x, Tp) for x in (Jpre, hpre, jd, n2, dJ, dh))
    out = pl.pallas_call(
        functools.partial(_filter_adj_kernel, d=d, U=U, T1=T1, G_=G),
        grid=(G,),
        in_specs=[_whole(), _whole(), _blk(U, dd, Bp, r),
                  _blk(U, d, Bp, r), _whole(), _blk(U, d, Bp, r),
                  _blk(U, d, Bp, r), _blk(U, dd, Bp, r),
                  _blk(U, d, Bp, r), _whole()],
        out_specs=[_blk(U, d, Bp, r), _blk(U, d, Bp, r), _whole(),
                   _whole(), _whole(), _whole(), _whole()],
        out_shape=[jax.ShapeDtypeStruct((Tp, d, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, d, Bp), dt),
                   jax.ShapeDtypeStruct((dd, Bp), dt),
                   jax.ShapeDtypeStruct((dd, Bp), dt),
                   jax.ShapeDtypeStruct((dd, Bp), dt),
                   jax.ShapeDtypeStruct((dd, Bp), dt),
                   jax.ShapeDtypeStruct((d, Bp), dt)],
        scratch_shapes=[pltpu.VMEM((dd, Bp), dt), pltpu.VMEM((d, Bp), dt),
                        pltpu.VMEM((dd, Bp), dt), pltpu.VMEM((dd, Bp), dt),
                        pltpu.VMEM((dd, Bp), dt)],
        compiler_params=_PARAMS,
        interpret=interpret,
    )(Dstat, wfwd, Jpre, hpre, Astat, jd, n2, dJ, dh, lam)
    djd, dn2 = out[0][:T1], out[1][:T1]
    dA, dC, dD, dJ0, dh0 = out[2:]
    return djd, dn2, dA, dC, dD, dJ0, dh0


def _sampler_fwd_call(P2w, P3w, Jft, hft, epsf, xT, *, d, U, interpret):
    T1, dd, Bp = Jft.shape
    dt = xT.dtype
    G, Tp = _grid_of(T1, U)
    r = G - 1
    Jft, hft, epsf = (_pad_time(x, Tp) for x in (Jft, hft, epsf))
    xb = pl.pallas_call(
        functools.partial(_sampler_fwd_kernel, d=d, U=U, T1=T1, G=G),
        grid=(G,),
        in_specs=[_whole(), _whole(), _blk(U, dd, Bp, r),
                  _blk(U, d, Bp, r), _blk(U, d, Bp, r), _whole()],
        out_specs=_blk(U, d, Bp, r),
        out_shape=jax.ShapeDtypeStruct((Tp, d, Bp), dt),
        scratch_shapes=[pltpu.VMEM((d, Bp), dt)],
        compiler_params=_PARAMS,
        interpret=interpret,
    )(P2w, P3w, Jft, hft, epsf, xT)
    return xb[:T1]


def _sampler_adj_call(P2w, P3w, Jft, hft, xb, xnext, dx, *, d, U,
                      interpret):
    T1, dd, Bp = Jft.shape
    dt = xb.dtype
    G, Tp = _grid_of(T1, U)
    Jft, hft, xb, xnext, dx = (
        _pad_time(x, Tp) for x in (Jft, hft, xb, xnext, dx))
    out = pl.pallas_call(
        functools.partial(_sampler_adj_kernel, d=d, U=U, T1=T1),
        grid=(G,),
        in_specs=[_whole(), _whole(), _blk(U, dd, Bp), _blk(U, d, Bp),
                  _blk(U, d, Bp), _blk(U, d, Bp), _blk(U, d, Bp)],
        out_specs=[_blk(U, dd, Bp), _blk(U, d, Bp), _whole(), _whole()],
        out_shape=[jax.ShapeDtypeStruct((Tp, dd, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, d, Bp), dt),
                   jax.ShapeDtypeStruct((d, Bp), dt),
                   jax.ShapeDtypeStruct((dd, Bp), dt)],
        scratch_shapes=[pltpu.VMEM((d, Bp), dt), pltpu.VMEM((dd, Bp), dt)],
        compiler_params=_PARAMS,
        interpret=interpret,
    )(P2w, P3w, Jft, hft, xb, xnext, dx)
    return out[0][:T1], out[1][:T1], out[2], out[3]


# ==========================================================================
# custom-VJP primitives
# ==========================================================================


@functools.lru_cache(maxsize=8)
def _prims(d, interpret, U):
    @jax.custom_vjp
    def filter_prim(J0, h0, Astat, Cstat, Dstat, wfwd, jd, n2):
        return _filter_fwd_call(J0, h0, Astat, Cstat, Dstat, wfwd, jd, n2,
                                d=d, U=U, interpret=interpret)

    def filter_fwd(J0, h0, Astat, Cstat, Dstat, wfwd, jd, n2):
        out = _filter_fwd_call(J0, h0, Astat, Cstat, Dstat, wfwd, jd, n2,
                               d=d, U=U, interpret=interpret)
        Jr, hr, _ = out
        Jpre = jnp.concatenate([J0[None], Jr[:-1]], axis=0)
        hpre = jnp.concatenate([h0[None], hr[:-1]], axis=0)
        return out, (Dstat, wfwd, Jpre, hpre, Astat, jd, n2)

    def filter_bwd(res, cots):
        Dstat, wfwd, Jpre, hpre, Astat, jd, n2 = res
        dJ, dh, dln = cots
        djd, dn2, dA, dC, dD, dJ0, dh0 = _filter_adj_call(
            Dstat, wfwd, Jpre, hpre, Astat, jd, n2, dJ, dh, dln,
            d=d, U=U, interpret=interpret)
        return (dJ0, dh0, dA, dC, dD, jnp.zeros_like(wfwd), djd, dn2)

    filter_prim.defvjp(filter_fwd, filter_bwd)

    @jax.custom_vjp
    def sampler_prim(P2w, P3w, Jft, hft, epsf, xT):
        return _sampler_fwd_call(P2w, P3w, Jft, hft, epsf, xT, d=d, U=U,
                                 interpret=interpret)

    def sampler_fwd(P2w, P3w, Jft, hft, epsf, xT):
        xb = _sampler_fwd_call(P2w, P3w, Jft, hft, epsf, xT, d=d, U=U,
                               interpret=interpret)
        return xb, (P2w, P3w, Jft, hft, xb, xT)

    def sampler_bwd(res, dx):
        P2w, P3w, Jft, hft, xb, xT = res
        xnext = jnp.concatenate([xb[1:], xT[None]], axis=0)
        dJc, dhf, dxT, dP2 = _sampler_adj_call(
            P2w, P3w, Jft, hft, xb, xnext, dx, d=d, U=U,
            interpret=interpret)
        dP3 = -2.0 * jnp.sum(dJc, axis=0)
        # eps cotangent intentionally dropped (iid noise, nothing
        # upstream), matching pallas_vjp.sampler_bwd.
        return (dP2, dP3, dJc, dhf, jnp.zeros_like(dx), dxT)

    sampler_prim.defvjp(sampler_fwd, sampler_bwd)

    return filter_prim, sampler_prim


# ==========================================================================
# smoothed-moment assembly (smallchol batched XLA, stationary pairs)
# ==========================================================================


def _assembly_xla(E1, E2, E3, jd, Jf, hf, Jb, hb):
    """Smoothed node/pair moments from the two information filters --
    the stationary-pair + diagonal-node specialization of
    pallas_vjp._smoother_assembly, on smallchol's custom-VJP'd batched
    linalg. (A row-list form on packed (T, B) slices was measured and
    rejected: rowalg expands every d x d matmul into d^3 separate HLO
    ops, which blew XLA compile time past 9 minutes at d=10; smallchol
    keeps matmuls as single dot ops and its closed-form adjoints avoid
    mechanical AD through the unrolled graphs.)"""
    from svae_tpu.utils import smallchol
    from svae_tpu.utils.psd import symmetrize

    d = E1.shape[-1]
    Js = Jf + Jb
    hs = hf + hb
    L = smallchol.chol(symmetrize(Js))
    Ex = smallchol.cho_solve(L, hs)
    eye = jnp.broadcast_to(jnp.eye(d, dtype=Js.dtype), Js.shape)
    Sig = smallchol.cho_solve_mat(L, eye)
    ExxT = symmetrize(Sig + Ex[..., :, None] * Ex[..., None, :])

    eye_d = jnp.eye(d, dtype=Js.dtype)
    J12l = -E2.T                                  # shared (d, d)
    J11 = -2.0 * E3 + Jf[:, :-1]
    # J22 = -2 (P1 + N1[t+1]) + Jb[t+1]; N1 diagonal = -1/2 diag(jd)
    J22 = -2.0 * E1 + eye_d * jd[:, 1:, :, None] + Jb[:, 1:]
    L11 = smallchol.chol(symmetrize(J11))
    J11inv_J12 = smallchol.cho_solve_mat(
        L11, jnp.broadcast_to(J12l, J11.shape))
    S = J22 - jnp.swapaxes(J12l, -1, -2) @ J11inv_J12
    LS = smallchol.chol(symmetrize(S))
    Sinv = smallchol.cho_solve_mat(LS, jnp.broadcast_to(eye_d, S.shape))
    Cov12 = -J11inv_J12 @ Sinv
    Exnxt = Cov12 + Ex[:, :-1, :, None] * Ex[:, 1:, None, :]
    return Ex, ExxT, Exnxt


# ==========================================================================
# public entry: the fully packed E-step
# ==========================================================================


def _filter_and_moments(init, pair_mats, nodes_diag, block_b=128,
                        interpret=False, unroll=None):
    """Shared first half of the packed pipeline: bidirectional filter
    pass + smoothed-moment assembly for stationary pairs and diagonal
    nodes. Returns ``(logZ (B,), Ex (B,T,d), ExxT (B,T,d,d),
    Exnxt (B,T-1,d,d), Jf, hf)`` with (Jf, hf) still in the packed
    (T, d*d, B) / (T, d, B) layout for the sampler."""
    I1, I2, Ic = init
    E1, E2, E3, Pc = pair_mats
    jd, n2 = nodes_diag
    B, T, d = n2.shape
    dd = d * d
    dt = n2.dtype
    T1 = T - 1
    U = _resolve_unroll(interpret, unroll)
    fprim, _ = _prims(d, interpret, U)

    # ---- lane layout: [fwd B | bwd B | pad] ----
    Bp = (2 * B + block_b - 1) // block_b * block_b
    pad = Bp - 2 * B
    lane_fwd = (jnp.arange(Bp) < B).astype(dt)[None]            # (1, Bp)
    eyef = jnp.eye(d, dtype=dt).reshape(dd)

    def whole_mat(fwd_m, bwd_m, pad_fill):
        # (dd,) fwd / bwd values -> (dd, Bp) whole operand
        cols = jnp.concatenate([
            jnp.broadcast_to(fwd_m[:, None], (dd, B)),
            jnp.broadcast_to(bwd_m[:, None], (dd, B)),
            jnp.broadcast_to(pad_fill[:, None], (dd, pad)),
        ], axis=1)
        return cols

    A_f = (-2.0 * E3).reshape(dd)
    A_b = (-2.0 * E1).reshape(dd)
    D_f = E2.reshape(dd)
    D_b = E2.T.reshape(dd)
    Astat = whole_mat(A_f, A_b, eyef)
    Cstat = whole_mat(A_b, A_f, eyef)   # C fwd = -2 P1; C bwd = -2 P3
    Dstat = whole_mat(D_f, D_b, jnp.zeros((dd,), dt))

    # ---- node streams: fwd rows t+1 ascending, bwd rows flipped ----
    def node_stream(x):  # (B, T, d) -> (T-1, d, Bp), frames 1..T-1
        fwd = x[:, 1:]                       # (B, T-1, d)
        bwd = jnp.flip(fwd, axis=1)
        cat = jnp.concatenate([fwd, bwd], axis=0)        # (2B, T-1, d)
        cat = jnp.concatenate(
            [cat, jnp.zeros((pad, T1, d), dt)], axis=0)  # (Bp, T-1, d)
        return jnp.moveaxis(cat, 0, -1)                  # (T-1, d, Bp)

    jds = node_stream(jd)
    n2s = node_stream(n2)

    # ---- init state: fwd lanes carry the t=0 marginal, bwd lanes 0 ----
    J0f = (jnp.broadcast_to((-2.0 * I1).reshape(dd)[None], (B, dd))
           + jd[:, 0] @ _diag_embed_mat(d, dt))          # (B, dd)
    h0f = jnp.broadcast_to(I2[None], (B, d)) + n2[:, 0]
    J0 = jnp.concatenate([
        J0f.T, jnp.zeros((dd, B), dt),
        jnp.broadcast_to(eyef[:, None], (dd, pad))], axis=1)
    h0 = jnp.concatenate([h0f.T, jnp.zeros((d, B + pad), dt)], axis=1)

    Jr, hr, ln = fprim(J0, h0, Astat, Cstat, Dstat, lane_fwd, jds, n2s)

    # ---- align halves (packed, (T, dd, B)) ----
    Jf = jnp.concatenate([J0[None, :, :B], Jr[:, :, :B]], axis=0)
    hf = jnp.concatenate([h0[None, :, :B], hr[:, :, :B]], axis=0)
    Jb = jnp.concatenate([jnp.flip(Jr[:, :, B:2 * B], axis=0),
                          jnp.zeros((1, dd, B), dt)], axis=0)
    hb = jnp.concatenate([jnp.flip(hr[:, :, B:2 * B], axis=0),
                          jnp.zeros((1, d, B), dt)], axis=0)

    # ---- logZ (per sequence) ----
    from svae_tpu.utils.psd import mvn_logZ_info
    JfT = jnp.moveaxis(Jf[-1], -1, 0).reshape(B, d, d)
    hfT = jnp.moveaxis(hf[-1], -1, 0)
    logZ = (ln[0, :B] + T1 * Pc + Ic + mvn_logZ_info(JfT, hfT))

    # ---- unpack the filter messages for the moment assembly ----
    # (two (T * d^2 * B)-float transposes; everything upstream stayed
    # packed, which is where the old path lost its time -- the broadcast
    # pair streams and their flips/packs are gone entirely)
    Jfu = jnp.moveaxis(Jf, -1, 0).reshape(B, T, d, d)
    Jbu = jnp.moveaxis(Jb, -1, 0).reshape(B, T, d, d)
    hfu = jnp.moveaxis(hf, -1, 0)
    hbu = jnp.moveaxis(hb, -1, 0)
    Ex, ExxT, Exnxt = _assembly_xla(E1, E2, E3, jd, Jfu, hfu, Jbu, hbu)
    return logZ, Ex, ExxT, Exnxt, Jf, hf


def lds_moments_stationary(init, pair_mats, nodes_diag, block_b=128,
                           interpret=False, unroll=None):
    """Packed-pipeline smoothed posterior moments (the eval-side twin of
    :func:`lds_estep_stationary` -- no sampling, no stat reduction):
    returns ``(logZ (B,), Ex (B,T,d), ExxT (B,T,d,d), Exnxt
    (B,T-1,d,d))``. Backs ``models.lds.posterior_moments`` on the
    production backend for time-homogeneous chains."""
    logZ, Ex, ExxT, Exnxt, _, _ = _filter_and_moments(
        init, pair_mats, nodes_diag, block_b=block_b, interpret=interpret,
        unroll=unroll)
    return logZ, Ex, ExxT, Exnxt


def lds_estep_stationary(init, pair_mats, nodes_diag, key, num_samples,
                         valid=None, block_b=128, interpret=False,
                         unroll=None, eps=None):
    """Packed-layout minibatch E-step for stationary shared pairs and
    diagonal node potentials. Returns ``(samples (S, B, T, d),
    (niw_stats, mniw_stats), local_kl)`` -- exactly the reduced contract
    of models.lds._batched_inference_pallas (parity-tested against it).

    ``pair_mats`` = (E1, E2, E3, Pc): the single expected pair potential
    under q(theta) (NOT broadcast over time). ``nodes_diag`` = (jd, h),
    each (B, T, d) with node precision contribution -1/2 diag(jd).
    ``valid``: optional (B, T) {0,1} frame-validity weights (trailing-pad
    ragged batches with stationary pairs are handled by the caller via
    the generic path; ``valid`` here only reweights the MNIW stats).
    ``eps``: optional (S, B, T, d) noise override (tests)."""
    I1, I2, Ic = init
    E1, E2, E3, Pc = pair_mats
    jd, n2 = nodes_diag
    B, T, d = n2.shape
    dd = d * d
    dt = n2.dtype
    S = int(num_samples)
    T1 = T - 1
    U = _resolve_unroll(interpret, unroll)
    _, sprim = _prims(d, interpret, U)
    eyef = jnp.eye(d, dtype=dt).reshape(dd)

    logZ, Ex, ExxT, Exnxt, Jf, hf = _filter_and_moments(
        init, pair_mats, nodes_diag, block_b=block_b, interpret=interpret,
        unroll=unroll)
    JfT = jnp.moveaxis(Jf[-1], -1, 0).reshape(B, d, d)
    hfT = jnp.moveaxis(hf[-1], -1, 0)

    cnt = jnp.asarray(B, dt)
    niw_stats = (jnp.sum(ExxT[:, 0], axis=0), jnp.sum(Ex[:, 0], axis=0),
                 cnt, cnt)
    ExnxtT = jnp.swapaxes(Exnxt, -1, -2)          # E[x_{t+1} x_t^T]
    if valid is None:
        mniw_stats = (
            jnp.sum(ExxT[:, 1:], axis=(0, 1)),
            jnp.sum(ExnxtT, axis=(0, 1)),
            jnp.sum(ExxT[:, :-1], axis=(0, 1)),
            T1 * cnt,
        )
    else:
        w = jnp.asarray(valid, dt)[:, 1:, None, None]
        mniw_stats = (
            jnp.sum(w * ExxT[:, 1:], axis=(0, 1)),
            jnp.sum(w * ExnxtT, axis=(0, 1)),
            jnp.sum(w * ExxT[:, :-1], axis=(0, 1)),
            jnp.sum(valid) - cnt,
        )

    # ---- local KL: sum N1*ExxT + sum h*Ex - sum logZ (N1 diagonal) ----
    diag_ExxT = jnp.diagonal(ExxT, axis1=-2, axis2=-1)   # (B, T, d)
    local_kl = (-0.5 * jnp.sum(jd * diag_ExxT) + jnp.sum(n2 * Ex)
                - jnp.sum(logZ))

    # ---- backward sampler on S*B lanes ----
    SB = S * B
    SBp = (SB + block_b - 1) // block_b * block_b
    spad = SBp - SB

    def tile_lanes(x, fill):  # (T1, m, B) -> (T1, m, SBp)
        xs = jnp.concatenate([x] * S, axis=-1)
        if spad:
            f = jnp.broadcast_to(fill[..., None],
                                 x.shape[:-1] + (spad,)).astype(dt)
            xs = jnp.concatenate([xs, f], axis=-1)
        return xs

    Jft_s = tile_lanes(Jf[:-1], eyef)
    hft_s = tile_lanes(hf[:-1], jnp.zeros((d,), dt))
    P2w = jnp.broadcast_to(E2.reshape(dd)[:, None], (dd, SBp))
    P3w = jnp.broadcast_to(E3.reshape(dd)[:, None], (dd, SBp))

    # terminal sample (differentiable XLA glue, as pallas_vjp.lds_sample)
    from svae_tpu.utils import smallchol
    from svae_tpu.utils.psd import symmetrize
    if eps is None:
        epsall = jax.random.normal(key, (S, B, T, d), dt)
    else:
        epsall = jnp.asarray(eps, dt)
    LT = smallchol.chol(symmetrize(JfT))
    muT = smallchol.cho_solve(LT, hfT)
    zT = smallchol.solve_upper_from_lower(LT[None], epsall[:, :, -1])
    xT = muT[None] + zT                                   # (S, B, d)
    xTp = jnp.moveaxis(xT.reshape(SB, d), 0, -1)
    if spad:
        xTp = jnp.concatenate([xTp, jnp.zeros((d, spad), dt)], axis=1)
    epsb = jnp.moveaxis(epsall[:, :, :-1].reshape(SB, T1, d), 0, -1)
    if spad:
        epsb = jnp.concatenate(
            [epsb, jnp.zeros((T1, d, spad), dt)], axis=-1)

    xb = sprim(P2w, P3w, Jft_s, hft_s, epsb, xTp)         # (T1, d, SBp)
    x_body = jnp.moveaxis(xb[:, :, :SB], -1, 0).reshape(S, B, T1, d)
    samples = jnp.concatenate([x_body, xT[:, :, None]], axis=2)

    return samples, (niw_stats, mniw_stats), local_kl


@functools.lru_cache(maxsize=4)
def _diag_embed_mat(d, dt):
    """(d, d*d) one-hot map: v -> flat(diag(v)) via v @ M.

    Returns a NUMPY array on purpose: converting to a jnp array here and
    caching it leaks the enclosing trace's constant into later traces
    (UnexpectedTracerError, seen on-chip); jnp ops consume the np operand
    directly."""
    import numpy as np
    M = np.zeros((d, d * d), dtype=np.dtype(dt))
    for i in range(d):
        M[i, i * d + i] = 1.0
    return M
