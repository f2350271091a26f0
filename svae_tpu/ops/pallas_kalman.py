"""Pallas TPU kernel for the sequential information-form Kalman filter.

The XLA ``lax.scan`` filter pays While-loop overhead per time step (~tens
of microseconds for a body of ~200 tiny fused ops). This kernel runs the
whole recursion as ONE Pallas program: the grid iterates the T-1
transitions, the filter state (J, h, lognorm) lives in VMEM scratch, the
minibatch rides the 128-wide lane axis, and the d x d matrix entries sit
on sublanes -- every unrolled Cholesky/substitution step is a (B,)-wide
VPU op. Pair potentials are shared across the batch (the LDS-SVAE case:
expected potentials under q(theta)); node potentials vary per (t, batch).

Data layout contract (host-side wrappers handle the packing):
  J0, h0        (d*d, B), (d, B)      init + node_0 potential, info form
  P1, P2, P3    (T-1, d*d)            pair potentials (shared over B)
  Pc            (T-1, 1)
  N1f           (T-1, d*d, B)         node precisions for t = 1..T-1
  N2f           (T-1, d, B)
outputs:
  Jf_tail, hf_tail (T-1, d*d, B), (T-1, d, B)   filtered messages t>=1
  lognorm          (1, B)                        accumulated marginal mass
                                                 (excl. the final logZ term
                                                 and the init constant)

Forward-only (used where gradients are not required, e.g. benchmark and
stop-gradient mean-field sweeps); the differentiable path stays on the
XLA scan. B must be a multiple of 128 (pad host-side).
"""

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2PI = 1.8378770664093453


def _chol_rows(a_rows, d):
    """Unrolled Cholesky on row-packed (d*d, B) values; returns the d*(d+1)/2
    lower-factor rows as a dict {(i, j): (B,) vector}."""
    L = {}
    for i in range(d):
        for j in range(i + 1):
            s = a_rows[i * d + j]
            for k in range(j):
                s = s - L[(i, k)] * L[(j, k)]
            if i == j:
                L[(i, j)] = jnp.sqrt(s)
            else:
                L[(i, j)] = s / L[(j, j)]
    return L


def _solve_lower_rows(L, b, d):
    x = []
    for i in range(d):
        s = b[i]
        for k in range(i):
            s = s - L[(i, k)] * x[k]
        x.append(s / L[(i, i)])
    return x


def _solve_upper_rows(L, b, d):
    x = [None] * d
    for i in range(d - 1, -1, -1):
        s = b[i]
        for k in range(i + 1, d):
            s = s - L[(k, i)] * x[k]
        x[i] = s / L[(i, i)]
    return x


def _filter_kernel(J0, h0, P1, P2, P3, Pc, N1f, N2f, Jf_out, hf_out,
                   ln_out, Js, hs, acc, *, d):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        Js[:] = J0[:]
        hs[:] = h0[:]
        acc[:] = jnp.zeros_like(acc)

    Jrows = Js[:]  # (d*d, B)
    hrows = hs[:]  # (d, B)
    # pair arrays are whole-array VMEM refs; dynamic-slice row t
    p1 = P1[pl.ds(t, 1), :][0]  # (d*d,)
    p2 = P2[pl.ds(t, 1), :][0]
    p3 = P3[pl.ds(t, 1), :][0]
    pc = Pc[pl.ds(t, 1), :][0, 0]

    # L_t = J - 2 P3_t  (condition x_t on the pair quadratic term)
    a = [Jrows[r] - 2.0 * p3[r] for r in range(d * d)]
    L = _chol_rows(a, d)
    h_list = [hrows[r] for r in range(d)]
    v = _solve_lower_rows(L, h_list, d)  # L^{-1} h (forward sub)
    # lognorm += d/2 log 2pi - 1/2 log|L_t| + 1/2 |v|^2 + Pc_t
    logdet = sum(jnp.log(L[(i, i)]) for i in range(d)) * 2.0
    quad = sum(vi * vi for vi in v)
    acc[0, :] = (
        acc[0, :] + 0.5 * d * LOG2PI - 0.5 * logdet + 0.5 * quad + pc
    )

    # w = L^{-T} v = (J - 2 P3)^{-1} h  (complete the cho_solve)
    w = _solve_upper_rows(L, v, d)
    # Minv_P2T[:, c] = (J - 2 P3)^{-1} P2^T e_c : columns of P2^T are rows
    # of P2; P2 is shared over batch so these are (B,)-broadcast scalars.
    MinvP2T = []  # MinvP2T[j][c] = ((J-2P3)^{-1} P2^T)[j, c] as (B,) vec
    for c in range(d):
        col = [jnp.broadcast_to(p2[c * d + j], Jrows.shape[1:])
               for j in range(d)]  # P2^T[:, c] = P2[c, :]
        y = _solve_lower_rows(L, col, d)
        MinvP2T.append(_solve_upper_rows(L, y, d))
    # J' = -2 P1 - P2 Minv P2^T - 2 N1_{t+1}
    n1 = N1f[0]  # (d*d, B)
    newJ = []
    for i in range(d):
        for j in range(d):
            s = -2.0 * p1[i * d + j] - 2.0 * n1[i * d + j]
            # (P2 MinvP2T)[i, j] = sum_k P2[i, k] MinvP2T[k][j]
            for k in range(d):
                s = s - p2[i * d + k] * MinvP2T[j][k]
            newJ.append(s)
    # h' = P2 w + N2_{t+1}
    n2 = N2f[0]  # (d, B)
    newh = []
    for i in range(d):
        s = n2[i]
        for k in range(d):
            s = s + p2[i * d + k] * w[k]
        newh.append(s)

    newJ_rows = jnp.stack(newJ, axis=0)
    newh_rows = jnp.stack(newh, axis=0)
    Js[:] = newJ_rows
    hs[:] = newh_rows
    Jf_out[0, :, :] = newJ_rows
    hf_out[0, :, :] = newh_rows
    ln_out[:] = acc[:]


def lds_filter_pallas(init, pairs, nodes, block_b=128,
                      interpret=False):
    """Forward filter with the Pallas kernel; same results as
    ``kalman.lds_filter`` (tested). Inputs in the standard kernel
    convention (svae_tpu/ops/__init__.py) with an extra leading batch axis
    on the NODE potentials only:

      nodes = (N1 (B, T, d, d), N2 (B, T, d)); init/pairs shared over B.

    Returns (logZ (B,), Jf (B, T, d, d), hf (B, T, d)). ``interpret=True``
    runs the Pallas interpreter (CPU-testable). Measured on TPU v5e:
    0.70 ms vs 4.13 ms for the XLA lax.scan filter at B=64, T=100, d=10
    (5.9x; docs/DESIGN.md).
    """
    I1, I2, Ic = init
    P1, P2, P3, Pc = pairs
    N1, N2 = nodes
    B, T, d = N2.shape
    dt = N2.dtype

    pad = (-B) % block_b
    if pad:
        N1 = jnp.concatenate(
            [N1, jnp.broadcast_to(jnp.eye(d, dtype=dt) * -0.5,
                                  (pad, T, d, d))], axis=0)
        N2 = jnp.concatenate([N2, jnp.zeros((pad, T, d), dt)], axis=0)
    Bp = B + pad

    # pack layouts
    J0 = (-2.0 * (I1[None] + N1[:, 0])).reshape(Bp, d * d).T  # (d*d, Bp)
    h0 = (I2[None] + N2[:, 0]).T  # (d, Bp)
    N1f = jnp.moveaxis(
        N1[:, 1:].reshape(Bp, T - 1, d * d), 0, -1)  # (T-1, dd, Bp)
    N2f = jnp.moveaxis(N2[:, 1:], 0, -1)  # (T-1, d, Bp)
    P1r = P1.reshape(T - 1, d * d)
    P2r = P2.reshape(T - 1, d * d)
    P3r = P3.reshape(T - 1, d * d)
    Pcr = Pc.reshape(T - 1, 1)

    grid = (T - 1,)
    dd = d * d
    kernel = functools.partial(_filter_kernel, d=d)
    out_shape = [
        jax.ShapeDtypeStruct((T - 1, dd, Bp), dt),
        jax.ShapeDtypeStruct((T - 1, d, Bp), dt),
        jax.ShapeDtypeStruct((1, Bp), dt),
    ]
    Jf_tail, hf_tail, lognorm = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # J0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # h0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # P1 (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # P2 (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # P3 (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Pc (whole)
            pl.BlockSpec((1, dd, Bp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),  # N1f
            pl.BlockSpec((1, d, Bp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),  # N2f
        ],
        out_specs=[
            pl.BlockSpec((1, dd, Bp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, Bp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((dd, Bp), dt),
            pltpu.VMEM((d, Bp), dt),
            pltpu.VMEM((1, Bp), dt),
        ],
        interpret=interpret,
    )(J0, h0, P1r, P2r, P3r, Pcr, N1f, N2f)

    Jf0 = J0.T.reshape(Bp, d, d)
    hf0 = h0.T
    Jf = jnp.concatenate(
        [Jf0[:, None], jnp.moveaxis(Jf_tail, -1, 0).reshape(
            Bp, T - 1, d, d)], axis=1)
    hf = jnp.concatenate(
        [hf0[:, None], jnp.moveaxis(hf_tail, -1, 0)], axis=1)

    # final logZ = lognorm + Ic + gauss_logZ(J_T, h_T)
    from svae_tpu.utils.psd import mvn_logZ_info

    logZ = lognorm[0] + Ic + mvn_logZ_info(Jf[:, -1], hf[:, -1])
    return logZ[:B], Jf[:B], hf[:B]


# --------------------------------------------------------------------------
# backward information filter (two-filter smoothing) kernel
# --------------------------------------------------------------------------


def _backward_kernel(P1, P2, P3, N1b, N2b, Jb_out, hb_out, Js, hs, *, d):
    s = pl.program_id(0)  # s = 0.. T-2;  t = T-2-s handled by index maps

    @pl.when(s == 0)
    def _init():
        Js[:] = jnp.zeros_like(Js)
        hs[:] = jnp.zeros_like(hs)

    # dynamic row t of the shared pair arrays
    T1 = pl.num_programs(0)
    t = T1 - 1 - s
    p1 = P1[pl.ds(t, 1), :][0]
    p2 = P2[pl.ds(t, 1), :][0]
    p3 = P3[pl.ds(t, 1), :][0]

    n1 = N1b[0]  # node t+1 (streamed via index map)
    n2 = N2b[0]
    Jrows = Js[:]
    hrows = hs[:]

    # M = -2 P1_t - 2 N1_{t+1} + Jb_{t+1}
    m = [(-2.0) * p1[r] - 2.0 * n1[r] + Jrows[r] for r in range(d * d)]
    L = _chol_rows(m, d)
    b0 = [hrows[r] + n2[r] for r in range(d)]
    y = _solve_lower_rows(L, b0, d)
    w = _solve_upper_rows(L, y, d)  # M^{-1} b0
    # hb_t = P2_t^T w
    newh = []
    for i in range(d):
        acc_i = p2[0 * d + i] * w[0]
        for k in range(1, d):
            acc_i = acc_i + p2[k * d + i] * w[k]
        newh.append(acc_i)
    # Minv P2: columns M^{-1} P2[:, c]
    MinvP2 = []
    for c in range(d):
        col = [jnp.broadcast_to(p2[j * d + c], Jrows.shape[1:])
               for j in range(d)]
        yc = _solve_lower_rows(L, col, d)
        MinvP2.append(_solve_upper_rows(L, yc, d))
    # Jb_t = -2 P3_t - P2^T Minv P2
    newJ = []
    for i in range(d):
        for j in range(d):
            v = -2.0 * p3[i * d + j]
            for k in range(d):
                v = v - p2[k * d + i] * MinvP2[j][k]
            newJ.append(v)

    newJ_rows = jnp.stack(newJ, axis=0)
    newh_rows = jnp.stack(newh, axis=0)
    Js[:] = newJ_rows
    hs[:] = newh_rows
    Jb_out[0, :, :] = newJ_rows
    hb_out[0, :, :] = newh_rows


def lds_backward_pallas(pairs, nodes, block_b=128, interpret=False):
    """Backward information filter (beta messages) with the Pallas kernel;
    mirrors ``oracles.lds_backward_seq`` without the constants. Layout
    contract as :func:`lds_filter_pallas`. Returns (Jb (B, T, d, d),
    hb (B, T, d)) with the t = T-1 entries zero."""
    P1, P2, P3, Pc = pairs
    N1, N2 = nodes
    B, T, d = N2.shape
    dt = N2.dtype

    pad = (-B) % block_b
    if pad:
        N1 = jnp.concatenate(
            [N1, jnp.broadcast_to(jnp.eye(d, dtype=dt) * -0.5,
                                  (pad, T, d, d))], axis=0)
        N2 = jnp.concatenate([N2, jnp.zeros((pad, T, d), dt)], axis=0)
    Bp = B + pad

    N1b = jnp.moveaxis(N1[:, 1:].reshape(Bp, T - 1, d * d), 0, -1)
    N2b = jnp.moveaxis(N2[:, 1:], 0, -1)
    P1r = P1.reshape(T - 1, d * d)
    P2r = P2.reshape(T - 1, d * d)
    P3r = P3.reshape(T - 1, d * d)

    dd = d * d
    kernel = functools.partial(_backward_kernel, d=d)
    out_shape = [
        jax.ShapeDtypeStruct((T - 1, dd, Bp), dt),
        jax.ShapeDtypeStruct((T - 1, d, Bp), dt),
    ]
    # grid step s handles t = T-2-s: stream node/output blocks reversed
    Jb_body, hb_body = pl.pallas_call(
        kernel,
        grid=(T - 1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # P1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # P2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # P3
            pl.BlockSpec((1, dd, Bp), lambda s: (T - 2 - s, 0, 0),
                         memory_space=pltpu.VMEM),  # N1 at t+1
            pl.BlockSpec((1, d, Bp), lambda s: (T - 2 - s, 0, 0),
                         memory_space=pltpu.VMEM),  # N2 at t+1
        ],
        out_specs=[
            pl.BlockSpec((1, dd, Bp), lambda s: (T - 2 - s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, Bp), lambda s: (T - 2 - s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((dd, Bp), dt),
            pltpu.VMEM((d, Bp), dt),
        ],
        interpret=interpret,
    )(P1r, P2r, P3r, N1b, N2b)

    zeros_J = jnp.zeros((Bp, 1, d, d), dt)
    zeros_h = jnp.zeros((Bp, 1, d), dt)
    Jb = jnp.concatenate(
        [jnp.moveaxis(Jb_body, -1, 0).reshape(Bp, T - 1, d, d), zeros_J],
        axis=1)
    hb = jnp.concatenate([jnp.moveaxis(hb_body, -1, 0), zeros_h], axis=1)
    return Jb[:B], hb[:B]


def lds_smoother_pallas(init, pairs, nodes, block_b=128, interpret=False,
                        filtered=None):
    """Full smoother on the Pallas filter kernels: forward + backward
    passes as fused kernels, node/pair marginal assembly as batched XLA
    (cheap vectorized math). Same outputs as ``kalman.lds_smoother``
    vmapped over the batch: (logZ (B,), Ex, ExxT, Exnxt). Forward-only.
    Pass ``filtered=(logZ, Jf, hf)`` to reuse an existing filter pass."""
    from svae_tpu.utils import smallchol
    from svae_tpu.utils.psd import symmetrize

    P1, P2, P3, Pc = pairs
    N1, N2 = nodes
    if filtered is None:
        logZ, Jf, hf = lds_filter_pallas(init, pairs, nodes,
                                         block_b=block_b,
                                         interpret=interpret)
    else:
        logZ, Jf, hf = filtered
    Jb, hb = lds_backward_pallas(pairs, nodes, block_b=block_b,
                                 interpret=interpret)

    Js = Jf + Jb
    hs = hf + hb
    L = smallchol.chol(symmetrize(Js))
    Ex = smallchol.cho_solve(L, hs)
    eye = jnp.broadcast_to(jnp.eye(Js.shape[-1], dtype=Js.dtype), Js.shape)
    Sig = smallchol.cho_solve_mat(L, eye)
    ExxT = symmetrize(Sig + Ex[..., :, None] * Ex[..., None, :])

    # pair cross-moments (same construction as kalman._smoother_core)
    J12l = -jnp.swapaxes(P2, -1, -2)[None]  # (1, T-1, d, d)
    J11 = -2.0 * P3[None] + Jf[:, :-1]
    J22 = -2.0 * (P1[None] + N1[:, 1:]) + Jb[:, 1:]
    L11 = smallchol.chol(symmetrize(J11))
    J11inv_J12 = smallchol.cho_solve_mat(L11, jnp.broadcast_to(
        J12l, J11.shape))
    S = J22 - jnp.swapaxes(J12l, -1, -2) @ J11inv_J12
    LS = smallchol.chol(symmetrize(S))
    eyeS = jnp.broadcast_to(jnp.eye(S.shape[-1], dtype=S.dtype), S.shape)
    Sinv = smallchol.cho_solve_mat(LS, eyeS)
    Cov12 = -J11inv_J12 @ Sinv
    Exnxt = Cov12 + Ex[:, :-1, :, None] * Ex[:, 1:, None, :]
    return logZ, Ex, ExxT, Exnxt


# --------------------------------------------------------------------------
# backward posterior sampler kernel
# --------------------------------------------------------------------------


def _sampler_kernel(P2, P3, Jff, hff, epsf, xT, x_out, xs, *, d):
    s = pl.program_id(0)  # t = T-2-s via index maps

    @pl.when(s == 0)
    def _init():
        xs[:] = xT[:]

    T1 = pl.num_programs(0)
    t = T1 - 1 - s
    p2 = P2[pl.ds(t, 1), :][0]
    p3 = P3[pl.ds(t, 1), :][0]

    jf = Jff[0]   # (d*d, SB) filtered precision at t
    hf = hff[0]   # (d, SB)
    eps = epsf[0]  # (d, SB)
    x_next = xs[:]

    # conditional precision Jc = Jf_t - 2 P3_t
    a = [jf[r] - 2.0 * p3[r] for r in range(d * d)]
    L = _chol_rows(a, d)
    # b = hf_t + P2_t^T x_{t+1}
    b = []
    for i in range(d):
        acc_i = hf[i]
        for k in range(d):
            acc_i = acc_i + p2[k * d + i] * x_next[k]
        b.append(acc_i)
    y = _solve_lower_rows(L, b, d)
    mu = _solve_upper_rows(L, y, d)
    # noise: z = L^{-T} eps
    z = _solve_upper_rows(L, [eps[i] for i in range(d)], d)
    x_new = jnp.stack([mu[i] + z[i] for i in range(d)], axis=0)
    xs[:] = x_new
    x_out[0, :, :] = x_new


def lds_sample_pallas(init, pairs, nodes, key, num_samples, block_b=128,
                      interpret=False, filtered=None, eps=None):
    """Posterior sampler on the Pallas kernel: the backward conditional
    recursion with num_samples particles per sequence packed onto the lane
    axis next to the batch. Matches ``kalman.lds_sample`` given the same
    (key-derived) noise. Returns (num_samples, B, T, d). Forward-only."""
    P1, P2, P3, Pc = pairs
    N1, N2 = nodes
    B, T, d = N2.shape
    dt = N2.dtype
    S = int(num_samples)

    if filtered is None:
        _, Jf, hf = lds_filter_pallas(init, pairs, nodes, block_b=block_b,
                                      interpret=interpret)
    else:
        Jf, hf = filtered

    if eps is None:
        eps = jax.random.normal(key, (S, B, T, d), dt)
    else:  # test hook: zero noise returns the smoothed mean exactly
        eps = jnp.asarray(eps, dt)

    # pack (S, B) onto lanes
    SB = S * B
    pad = (-SB) % block_b
    SBp = SB + pad

    def pack(x):  # (S, B, T, ...) -> (T, prod(...), SBp)
        x = x.reshape((SB, T, -1))
        x = jnp.moveaxis(x, 0, -1)
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros(x.shape[:-1] + (pad,), dt)], axis=-1)
        return x

    Jf_r = jnp.broadcast_to(Jf[None], (S,) + Jf.shape)
    hf_r = jnp.broadcast_to(hf[None], (S,) + hf.shape)
    Jff = pack(Jf_r)   # (T, dd, SBp)
    hff = pack(hf_r)   # (T, d, SBp)
    epsf = pack(eps)   # (T, d, SBp)

    # pad lanes of Jff with identity-ish precisions to keep chol finite
    if pad:
        eye_rows = (jnp.eye(d, dtype=dt).reshape(d * d))[None, :, None]
        Jff = Jff.at[:, :, SB:].add(eye_rows)

    # terminal sample host-side (one batched solve)
    from svae_tpu.utils import smallchol
    from svae_tpu.utils.psd import symmetrize

    LT = smallchol.chol(symmetrize(Jf[:, -1]))
    muT = smallchol.cho_solve(LT, hf[:, -1])
    zT = smallchol.solve_upper_from_lower(LT[None], eps[:, :, -1])
    xT = muT[None] + zT  # (S, B, d)
    xT_p = jnp.moveaxis(xT.reshape(SB, d), 0, -1)
    if pad:
        xT_p = jnp.concatenate([xT_p, jnp.zeros((d, pad), dt)], axis=-1)

    dd = d * d
    kernel = functools.partial(_sampler_kernel, d=d)
    x_body = pl.pallas_call(
        kernel,
        grid=(T - 1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # P2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # P3
            pl.BlockSpec((1, dd, SBp), lambda s: (T - 2 - s, 0, 0),
                         memory_space=pltpu.VMEM),  # Jf at t
            pl.BlockSpec((1, d, SBp), lambda s: (T - 2 - s, 0, 0),
                         memory_space=pltpu.VMEM),  # hf at t
            pl.BlockSpec((1, d, SBp), lambda s: (T - 2 - s, 0, 0),
                         memory_space=pltpu.VMEM),  # eps at t
            pl.BlockSpec(memory_space=pltpu.VMEM),  # xT
        ],
        out_specs=pl.BlockSpec((1, d, SBp), lambda s: (T - 2 - s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T - 1, d, SBp), dt),
        scratch_shapes=[pltpu.VMEM((d, SBp), dt)],
        interpret=interpret,
    )(P2.reshape(T - 1, dd), P3.reshape(T - 1, dd), Jff, hff, epsf, xT_p)

    x_body = jnp.moveaxis(x_body[..., :SB], -1, 0).reshape(SB, T - 1, d)
    xs = jnp.concatenate([x_body, xT.reshape(SB, 1, d)], axis=1)
    return xs.reshape(S, B, T, d)


def lds_estep_pallas(init, pairs, nodes, key, num_samples, block_b=128,
                     interpret=False):
    """Fused forward E-step on the Pallas kernels: ONE filter pass shared
    by the smoother assembly and the backward sampler (the composition
    ``kalman.lds_inference`` provides on the XLA path). Forward-only.

    Returns ``(samples (S, B, T, d), (Ex, ExxT, Exnxt), logZ (B,))``.
    """
    filt = lds_filter_pallas(init, pairs, nodes, block_b=block_b,
                             interpret=interpret)
    logZ, Jf, hf = filt
    _, Ex, ExxT, Exnxt = lds_smoother_pallas(init, pairs, nodes,
                                             block_b=block_b,
                                             interpret=interpret,
                                             filtered=filt)
    samples = lds_sample_pallas(init, pairs, nodes, key, num_samples,
                                block_b=block_b, interpret=interpret,
                                filtered=(Jf, hf))
    return samples, (Ex, ExxT, Exnxt), logZ


# --------------------------------------------------------------------------
# per-sequence pair potentials (the SLDS state-averaged case)
# --------------------------------------------------------------------------


def _filter_kernel_bpairs(J0, h0, P1f, P2f, P3f, Pcf, N1f, N2f, Jf_out,
                          hf_out, ln_out, Js, hs, acc, *, d):
    """Filter kernel with pair potentials streamed per (t, batch) like the
    nodes -- the layout the SLDS mean-field needs (averaged pairs differ
    per sequence). Same math as _filter_kernel with (B,)-vector pairs."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        Js[:] = J0[:]
        hs[:] = h0[:]
        acc[:] = jnp.zeros_like(acc)

    Jrows = Js[:]
    hrows = hs[:]
    p1 = P1f[0]  # (d*d, B)
    p2 = P2f[0]
    p3 = P3f[0]
    pc = Pcf[0][0]  # (B,)

    a = [Jrows[r] - 2.0 * p3[r] for r in range(d * d)]
    L = _chol_rows(a, d)
    h_list = [hrows[r] for r in range(d)]
    v = _solve_lower_rows(L, h_list, d)
    logdet = sum(jnp.log(L[(i, i)]) for i in range(d)) * 2.0
    quad = sum(vi * vi for vi in v)
    acc[0, :] = (
        acc[0, :] + 0.5 * d * LOG2PI - 0.5 * logdet + 0.5 * quad + pc
    )

    w = _solve_upper_rows(L, v, d)
    MinvP2T = []
    for c in range(d):
        col = [p2[c * d + j] for j in range(d)]
        y = _solve_lower_rows(L, col, d)
        MinvP2T.append(_solve_upper_rows(L, y, d))
    n1 = N1f[0]
    newJ = []
    for i in range(d):
        for j in range(d):
            s = -2.0 * p1[i * d + j] - 2.0 * n1[i * d + j]
            for k in range(d):
                s = s - p2[i * d + k] * MinvP2T[j][k]
            newJ.append(s)
    n2 = N2f[0]
    newh = []
    for i in range(d):
        s = n2[i]
        for k in range(d):
            s = s + p2[i * d + k] * w[k]
        newh.append(s)

    newJ_rows = jnp.stack(newJ, axis=0)
    newh_rows = jnp.stack(newh, axis=0)
    Js[:] = newJ_rows
    hs[:] = newh_rows
    Jf_out[0, :, :] = newJ_rows
    hf_out[0, :, :] = newh_rows
    ln_out[:] = acc[:]


def lds_filter_pallas_bpairs(init, pairs, nodes, block_b=128,
                             interpret=False):
    """Forward filter with PER-SEQUENCE pair potentials:

      pairs = (P1, P2, P3, Pc) with leading (B, T-1) axes,
      nodes = (N1 (B, T, d, d), N2 (B, T, d)); init shared over B.

    Returns (logZ (B,), Jf (B, T, d, d), hf (B, T, d)) like
    :func:`lds_filter_pallas`.
    """
    I1, I2, Ic = init
    P1, P2, P3, Pc = pairs
    N1, N2 = nodes
    B, T, d = N2.shape
    dt = N2.dtype

    pad = (-B) % block_b
    if pad:
        N1 = jnp.concatenate(
            [N1, jnp.broadcast_to(jnp.eye(d, dtype=dt) * -0.5,
                                  (pad, T, d, d))], axis=0)
        N2 = jnp.concatenate([N2, jnp.zeros((pad, T, d), dt)], axis=0)
        padP = lambda a, fill: jnp.concatenate(
            [a, jnp.broadcast_to(fill, (pad,) + a.shape[1:])], axis=0)
        P1 = padP(P1, -0.5 * jnp.eye(d, dtype=dt))
        P2 = padP(P2, jnp.zeros((d, d), dt))
        P3 = padP(P3, -0.5 * jnp.eye(d, dtype=dt))
        Pc = padP(Pc, jnp.zeros((), dt))
    Bp = B + pad

    J0 = (-2.0 * (I1[None] + N1[:, 0])).reshape(Bp, d * d).T
    h0 = (I2[None] + N2[:, 0]).T
    pack3 = lambda a, m: jnp.moveaxis(a.reshape(Bp, T - 1, m), 0, -1)
    N1f = jnp.moveaxis(N1[:, 1:].reshape(Bp, T - 1, d * d), 0, -1)
    N2f = jnp.moveaxis(N2[:, 1:], 0, -1)
    P1f = pack3(P1, d * d)
    P2f = pack3(P2, d * d)
    P3f = pack3(P3, d * d)
    Pcf = pack3(Pc, 1)

    dd = d * d
    kernel = functools.partial(_filter_kernel_bpairs, d=d)
    out_shape = [
        jax.ShapeDtypeStruct((T - 1, dd, Bp), dt),
        jax.ShapeDtypeStruct((T - 1, d, Bp), dt),
        jax.ShapeDtypeStruct((1, Bp), dt),
    ]
    blk = lambda m: pl.BlockSpec((1, m, Bp), lambda t: (t, 0, 0),
                                 memory_space=pltpu.VMEM)
    Jf_tail, hf_tail, lognorm = pl.pallas_call(
        kernel,
        grid=(T - 1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # J0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # h0
            blk(dd), blk(dd), blk(dd), blk(1),      # P1f..Pcf
            blk(dd), blk(d),                        # N1f, N2f
        ],
        out_specs=[blk(dd), blk(d),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((dd, Bp), dt),
            pltpu.VMEM((d, Bp), dt),
            pltpu.VMEM((1, Bp), dt),
        ],
        interpret=interpret,
    )(J0, h0, P1f, P2f, P3f, Pcf, N1f, N2f)

    Jf0 = J0.T.reshape(Bp, d, d)
    hf0 = h0.T
    Jf = jnp.concatenate(
        [Jf0[:, None], jnp.moveaxis(Jf_tail, -1, 0).reshape(
            Bp, T - 1, d, d)], axis=1)
    hf = jnp.concatenate(
        [hf0[:, None], jnp.moveaxis(hf_tail, -1, 0)], axis=1)

    from svae_tpu.utils.psd import mvn_logZ_info

    logZ = lognorm[0] + Ic + mvn_logZ_info(Jf[:, -1], hf[:, -1])
    return logZ[:B], Jf[:B], hf[:B]
