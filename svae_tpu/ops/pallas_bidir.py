"""Bidirectional lane-packed Kalman kernels: BOTH information filters on
one set of 128 lanes, ONE chain step per grid step.

The fused kernel in svae_tpu/ops/pallas_vjp.py (``fb_pass``) runs the
forward and backward information filters by interleaving TWO chain steps
per grid step over B lanes -- at B=64 half the 128-lane layout is padding
while the serialized chain does double work per step (BASELINE.md
batch-sweep row; DESIGN.md roadmap #2). This module removes that waste by
putting the *time-reversed backward recursion on the idle lanes*:

  lanes [0, B)    forward filter of sequence i, operands ascending in t
  lanes [B, 2B)   backward filter of sequence i, operands pre-reversed
                  in time and with P2 transposed
  lanes [2B, Bp)  lane padding

Both recursions are instances of ONE generic information-filter step

  M    = J + A_t            (carry + per-step offset)
  newJ = C_t - D_t M^{-1} D_t^T
  newh = D_t M^{-1} (h + f_t) + e_t
  inc  = d/2 log 2pi - 1/2 log|M| + 1/2 (h+f)^T M^{-1} (h+f) + pc_t

with, per half (t' = T-2-t is the reversed stream row):

  forward lanes:  A=-2 P3_t,  C=-2 P1_t - 2 N1_{t+1},  D=P2_t,
                  e=N2_{t+1}, f=0,           pc=Pc_t
  backward lanes: A=-2 P1_t' - 2 N1_{t'+1},  C=-2 P3_t',  D=P2_t'^T,
                  e=0,        f=N2_{t'+1},   pc=0

i.e. the backward streams are the time-flipped forward streams with
(A, C) swapped, (e, f) swapped and D transposed -- so the packing glue is
pure XLA data movement and the per-lane kernel math is bit-identical to
the separate kernels' (same op sequences; tested).

The payoff: T-1 grid steps of ONE serialized chain step with all lanes
live, instead of T-1 steps of TWO chain steps with half the lanes idle --
~2x less serialized work per pass whenever ceil(2B/128) < 2*ceil(B/128)
(any B with B mod 128 in [1, 64]). The adjoint unifies the same way: the
filter adjoint sweeps descending in t and the backward-filter adjoint
ascending in t, which are BOTH descending in their own (pre-reversed)
stream coordinate -- one reversed-stream adjoint kernel serves both, with
df = hbar and dD picking up a transpose on the backward half (undone in
glue; derivation in pallas_vjp.py's module docstring, extended here by
the f-channel: d/df = lam * M^{-1}(h+f) + M^{-1} D^T g = hbar exactly).

This is the TPU-native counterpart of the reference's Cython fast path
(reference: svae/lds/cython_lds_inference.pyx; SURVEY.md section 2 #13)
at full lane occupancy for small batches. ``pallas_vjp.fb_pass`` routes
here automatically when the layout wins (``bidir=None``).
"""

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svae_tpu.ops import rowalg as ra
from svae_tpu.ops.pallas_vjp import (
    LOG2PI, _PARAMS, _blk, _whole, _grid_of, _pad_time, _pad_batch,
    _pack, _unpack, _rows, _store_u, _resolve_unroll)


# ==========================================================================
# kernels
# ==========================================================================


def _bidir_fwd_kernel(J0, h0, A, C, D, E, F, Pc, J_out, h_out, ln_out,
                      Js, hs, acc, *, d, U, T1):
    b = pl.program_id(0)  # block of U consecutive stream rows
    dd = d * d
    masked = (T1 % U) != 0  # streams zero-padded to ceil(T1/U)*U

    @pl.when(b == 0)
    def _():
        Js[:] = J0[:]
        hs[:] = h0[:]
        acc[:] = jnp.zeros_like(acc)

    J = _rows(Js[:], dd)
    h = _rows(hs[:], d)
    a = acc[0, :]
    for u in range(U):
        Au = _rows(A[u], dd)
        Cu = _rows(C[u], dd)
        Du = _rows(D[u], dd)
        eu = _rows(E[u], d)
        fu = _rows(F[u], d)
        pc = Pc[u][0]

        M = ra.add(J, Au)
        L = ra.chol(M, d)
        bvec = ra.add(h, fu)
        v = ra.solve_lower(L, bvec, d)
        inc = (0.5 * d * LOG2PI - 0.5 * ra.logdet_from_chol(L, d)
               + 0.5 * ra.dot(v, v) + pc)
        w = ra.solve_upper(L, v, d)  # M^{-1} (h + f)
        Minv_DT = ra.solve_upper_mat(
            L, ra.solve_lower_mat(L, ra.transpose(Du, d), d), d)
        J = ra.sub(Cu, ra.matmul(Du, Minv_DT, d))
        h = ra.add(ra.matvec(Du, w, d), eu)
        if masked:
            # tail pad rows (both halves are tail-padded: the backward
            # streams were reversed BEFORE padding): only the running
            # lognorm survives them, so it alone is masked.
            a = a + jnp.where(b * U + u < T1, inc, 0.0)
        else:
            a = a + inc
        J_out[u, :, :] = jnp.stack(J, axis=0)
        h_out[u, :, :] = jnp.stack(h, axis=0)

    Js[:] = jnp.stack(J, axis=0)
    hs[:] = jnp.stack(h, axis=0)
    acc[0, :] = a
    ln_out[:] = acc[:]


def _bidir_adj_kernel(D, Mst, vst, dJ, dh, lam,
                      dC_out, de_out, df_out, dD_out, dA_out,
                      dJ0_out, dh0_out, cJ, ch, *, d, U, T1, G_):
    """Unified adjoint: descending sweep in the stream coordinate (the
    filter adjoint runs t descending; the backward-filter adjoint runs t
    ascending = stream-row descending), carries masked through the tail
    pads it meets first. ``lam`` (the lognorm cotangent) is zero on the
    backward half, which reduces the step to the backward adjoint with
    df == bbar and dD == (backward dP2)^T."""
    s = pl.program_id(0)  # fetches block G_-1-s; rows walked u = U-1..0
    dd = d * d
    masked = (T1 % U) != 0

    @pl.when(s == 0)
    def _():
        cJ[:] = jnp.zeros_like(cJ)
        ch[:] = jnp.zeros_like(ch)

    Mc = _rows(cJ[:], dd)
    hc = _rows(ch[:], d)
    for u_i in reversed(range(U)):
        G = ra.add(Mc, _rows(dJ[u_i], dd))
        g = ra.add(hc, _rows(dh[u_i], d))
        Du = _rows(D[u_i], dd)
        M = _rows(Mst[u_i], dd)
        v = _rows(vst[u_i], d)
        lv = lam[0]  # (Bp,) lognorm cotangent; zero on backward lanes

        L = ra.chol(M, d)
        W = ra.cho_inverse(L, d)
        w = ra.matvec(W, v, d)
        uvec = ra.matvec_T(Du, g, d)  # D^T g
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

        _store_u(dC_out, u_i, G)
        _store_u(de_out, u_i, g)
        _store_u(df_out, u_i, hbar)
        _store_u(dD_out, u_i, dDu)
        _store_u(dA_out, u_i, Mbar)
        if masked:
            # descending sweep: the zero carry must ride through the
            # tail pad rows it meets first.
            live = (G_ - 1 - s) * U + u_i < T1
            Mc = [jnp.where(live, x, y) for x, y in zip(Mbar, Mc)]
            hc = [jnp.where(live, x, y) for x, y in zip(hbar, hc)]
        else:
            Mc, hc = Mbar, hbar

    cJ[:] = jnp.stack(Mc, axis=0)
    ch[:] = jnp.stack(hc, axis=0)
    dJ0_out[:] = cJ[:]
    dh0_out[:] = ch[:]


# ==========================================================================
# pallas_call plumbing
# ==========================================================================


def _bidir_fwd_call(J0, h0, A, C, D, E, F, Pc, *, d, U, interpret):
    T1, dd, Bp = A.shape
    dt = J0.dtype
    G, Tp = _grid_of(T1, U)
    A, C, D, E, F, Pc = (_pad_time(x, Tp) for x in (A, C, D, E, F, Pc))
    Jr, hr, ln = pl.pallas_call(
        functools.partial(_bidir_fwd_kernel, d=d, U=U, T1=T1),
        grid=(G,),
        in_specs=[_whole(), _whole(), _blk(U, dd, Bp), _blk(U, dd, Bp),
                  _blk(U, dd, Bp), _blk(U, d, Bp), _blk(U, d, Bp),
                  _blk(U, 1, Bp)],
        out_specs=[_blk(U, dd, Bp), _blk(U, d, Bp), _whole()],
        out_shape=[jax.ShapeDtypeStruct((Tp, dd, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, d, Bp), dt),
                   jax.ShapeDtypeStruct((1, Bp), dt)],
        scratch_shapes=[pltpu.VMEM((dd, Bp), dt), pltpu.VMEM((d, Bp), dt),
                        pltpu.VMEM((1, Bp), dt)],
        compiler_params=_PARAMS,
        interpret=interpret,
    )(J0, h0, A, C, D, E, F, Pc)
    return Jr[:T1], hr[:T1], ln


def _bidir_adj_call(D, Mst, vst, dJ, dh, lam, *, d, U, interpret):
    T1, dd, Bp = D.shape
    dt = D.dtype
    G, Tp = _grid_of(T1, U)
    r = G - 1
    D, Mst, vst, dJ, dh = (
        _pad_time(x, Tp) for x in (D, Mst, vst, dJ, dh))
    out = pl.pallas_call(
        functools.partial(_bidir_adj_kernel, d=d, U=U, T1=T1, G_=G),
        grid=(G,),
        in_specs=[_blk(U, dd, Bp, r), _blk(U, dd, Bp, r),
                  _blk(U, d, Bp, r), _blk(U, dd, Bp, r),
                  _blk(U, d, Bp, r), _whole()],
        out_specs=[_blk(U, dd, Bp, r), _blk(U, d, Bp, r),
                   _blk(U, d, Bp, r), _blk(U, dd, Bp, r),
                   _blk(U, dd, Bp, r), _whole(), _whole()],
        out_shape=[jax.ShapeDtypeStruct((Tp, dd, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, d, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, d, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, dd, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, dd, Bp), dt),
                   jax.ShapeDtypeStruct((dd, Bp), dt),
                   jax.ShapeDtypeStruct((d, Bp), dt)],
        scratch_shapes=[pltpu.VMEM((dd, Bp), dt), pltpu.VMEM((d, Bp), dt)],
        compiler_params=_PARAMS,
        interpret=interpret,
    )(D, Mst, vst, dJ, dh, lam)
    return tuple(x[:T1] for x in out[:5]) + tuple(out[5:])


# ==========================================================================
# custom-VJP primitive
# ==========================================================================


@functools.lru_cache(maxsize=8)
def _bidir_prims(d, interpret, U):
    """Unified-step primitive for (d, interpret, unroll). Operand
    cotangents (see module docstring): dA = Mbar, dC = G, dD = dDu,
    de = g, df = hbar, dpc = dln broadcast, plus (dJ0, dh0) from the
    final descending carry."""

    @jax.custom_vjp
    def bidir_prim(J0, h0, A, C, D, E, F, Pc):
        return _bidir_fwd_call(J0, h0, A, C, D, E, F, Pc, d=d, U=U,
                               interpret=interpret)

    def bidir_fwd(J0, h0, A, C, D, E, F, Pc):
        out = _bidir_fwd_call(J0, h0, A, C, D, E, F, Pc, d=d, U=U,
                              interpret=interpret)
        Jr, hr, _ = out
        Jpre = jnp.concatenate([J0[None], Jr[:-1]], axis=0)
        hpre = jnp.concatenate([h0[None], hr[:-1]], axis=0)
        Mst = Jpre + A
        vst = hpre + F
        return out, (D, Mst, vst)

    def bidir_bwd(res, cots):
        D, Mst, vst = res
        dJ, dh, dln = cots
        T1 = D.shape[0]
        dC, de, df, dD, dA, dJ0, dh0 = _bidir_adj_call(
            D, Mst, vst, dJ, dh, dln, d=d, U=U, interpret=interpret)
        dPc = jnp.broadcast_to(dln[None], (T1,) + dln.shape)
        return (dJ0, dh0, dA, dC, dD, de, df, dPc)

    bidir_prim.defvjp(bidir_fwd, bidir_bwd)
    return bidir_prim


# ==========================================================================
# packing glue (differentiable XLA) + public entry
# ==========================================================================


def fb_pass(init, pairs, nodes, block_b=128, interpret=False, unroll=None):
    """Bidirectional-layout twin of ``pallas_vjp.fb_pass``: same contract
    ``(logZ (B,), Jf, hf, Jb, hb)``, both information filters on one lane
    set with one chain step per grid step. Differentiable end-to-end (the
    packing below is plain XLA, so its transpose -- flips, concat slices,
    shared-pair broadcast sums -- comes from autodiff; the kernel math
    rides the unified custom-VJP adjoint)."""
    I1, I2, Ic = init
    P1, P2, P3, Pc = pairs
    N1, N2 = nodes
    B, T, d = N2.shape
    dt = N2.dtype
    if P1.ndim == 3:  # shared pairs -> broadcast (cotangents sum over B)
        P1 = jnp.broadcast_to(P1[None], (B,) + P1.shape)
        P2 = jnp.broadcast_to(P2[None], (B,) + P2.shape)
        P3 = jnp.broadcast_to(P3[None], (B,) + P3.shape)
        Pc = jnp.broadcast_to(Pc[None], (B,) + Pc.shape)

    # forward-half unified streams, (B, T-1, ...)
    A_f = -2.0 * P3
    C_f = -2.0 * P1 - 2.0 * N1[:, 1:]
    e_f = N2[:, 1:]
    # backward half = time-flipped forward streams with (A, C) swapped,
    # (e, f) swapped, D transposed, pc zeroed
    flip = lambda x: jnp.flip(x, axis=1)
    zvec = jnp.zeros_like(e_f)
    A = jnp.concatenate([A_f, flip(C_f)], axis=0)
    C = jnp.concatenate([C_f, flip(A_f)], axis=0)
    D = jnp.concatenate([P2, jnp.swapaxes(flip(P2), -1, -2)], axis=0)
    E = jnp.concatenate([e_f, zvec], axis=0)
    F = jnp.concatenate([zvec, flip(e_f)], axis=0)
    PcS = jnp.concatenate([Pc, jnp.zeros_like(Pc)], axis=0)
    J0_f = -2.0 * (I1[None] + N1[:, 0])
    h0_f = I2[None] + N2[:, 0]
    J0 = jnp.concatenate([J0_f, jnp.zeros_like(J0_f)], axis=0)
    h0 = jnp.concatenate([h0_f, jnp.zeros_like(h0_f)], axis=0)

    # lane pad + pack
    pad = (-2 * B) % block_b
    eye = jnp.eye(d, dtype=dt)
    zero = jnp.zeros((), dt)
    A = _pad_batch(A, pad, eye)
    C = _pad_batch(C, pad, eye)
    D = _pad_batch(D, pad, zero)
    E = _pad_batch(E, pad, zero)
    F = _pad_batch(F, pad, zero)
    PcS = _pad_batch(PcS, pad, zero)
    J0 = _pad_batch(J0, pad, eye)
    h0 = _pad_batch(h0, pad, zero)
    dd = d * d
    Ap, Cp, Dp = _pack(A, dd), _pack(C, dd), _pack(D, dd)
    Ep, Fp = _pack(E, d), _pack(F, d)
    PcP = _pack(PcS[..., None], 1)
    J0p = _pack(J0[:, None], dd)[0]
    h0p = _pack(h0[:, None], d)[0]

    prim = _bidir_prims(d, interpret, _resolve_unroll(interpret, unroll))
    Jr, hr, ln = prim(J0p, h0p, Ap, Cp, Dp, Ep, Fp, PcP)

    Jall = _unpack(Jr, (d, d))  # (Bp, T-1, d, d)
    hall = _unpack(hr, (d,))
    Jf = jnp.concatenate([J0_f[:, None], Jall[:B]], axis=1)
    hf = jnp.concatenate([h0_f[:, None], hall[:B]], axis=1)
    zJ = jnp.zeros((B, 1, d, d), dt)
    zh = jnp.zeros((B, 1, d), dt)
    Jb = jnp.concatenate([flip(Jall[B:2 * B]), zJ], axis=1)
    hb = jnp.concatenate([flip(hall[B:2 * B]), zh], axis=1)

    from svae_tpu.utils.psd import mvn_logZ_info

    logZ = ln[0, :B] + Ic + mvn_logZ_info(Jf[:, -1], hf[:, -1])
    return logZ, Jf, hf, Jb, hb
