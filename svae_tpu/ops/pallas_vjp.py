"""Differentiable fused Pallas Kalman kernels: hand-derived adjoint
recursions as ``jax.custom_vjp``.

This is the TPU-native counterpart of the reference's production training
path -- Cython message-passing kernels with hand-written backward passes
registered as autograd primitives (reference:
svae/lds/cython_lds_inference.pyx ``*_grad`` kernels + ``defvjp``;
SURVEY.md section 2 #13). Four primitives, each a forward Pallas kernel
plus a hand-derived adjoint Pallas kernel:

  * forward information filter       (adjoint runs backward in time)
  * backward information filter      (adjoint runs forward in time)
  * backward conditional sampler     (adjoint runs forward in time)
  * FUSED forward+backward filters   (both directions in ONE pass via
    opposite per-operand index maps; mixed-direction fused adjoint)

The smoothed-moment assembly between them is cheap batched XLA built on
custom-VJP'd unrolled linalg (svae_tpu/utils/smallchol.py), so composing
the primitives gives a fully differentiable E-step
(``lds_estep``) whose forward AND backward passes ride fused kernels.

Adjoint derivations (per filter step; the other two are symmetric):

  forward:  M = J_t - 2 P3,  W = M^{-1}
            J_{t+1} = -2 P1 - 2 N1' - P2 W P2^T
            h_{t+1} = P2 W h_t + N2'
            c_t     = d/2 log 2pi - 1/2 log|M| + 1/2 h_t^T W h_t + Pc
  adjoint, given G = dJ_{t+1} (carry + direct), g = dh_{t+1}, lam = dc:
            dP1 = dN1' = -2 G            dN2' = g          dPc = lam
            dP2 = -(G + G^T) P2 W + g (W h_t)^T
            Wbar = -P2^T G P2 + (P2^T g) h_t^T + lam/2 h_t h_t^T
            Mbar = sym(-W Wbar W - lam/2 W)
            dJ_t = Mbar (carry)          dh_t = lam W h_t + W P2^T g
            dP3 = -2 Mbar

All data rides the kernels' lane-packed layout: batch (or batch x
particles) on the 128-lane axis, d x d matrix entries row-major on
sublanes, pair potentials streamed per (t, lane) -- the per-sequence
("bpairs") layout, so the SAME primitives serve the LDS (shared pairs,
broadcast outside the primitive; cotangent reduction over the batch is
then the automatic transpose of the broadcast) and the SLDS state-averaged
mean-field (per-sequence pairs). Everything also runs under
``interpret=True`` for CPU-based CI.
"""

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svae_tpu.ops import rowalg as ra

LOG2PI = 1.8378770664093453


def _rows(ref_slice, n):
    """(n, B) array -> list of n lane vectors."""
    return [ref_slice[i] for i in range(n)]


def _store(out_ref, rows):
    out_ref[0, :, :] = jnp.stack(rows, axis=0)


def _store_u(out_ref, u, rows):
    out_ref[u, :, :] = jnp.stack(rows, axis=0)


# ==========================================================================
# forward kernels (per-sequence pair layout)
# ==========================================================================


def _filter_fwd_kernel(J0, h0, P1f, P2f, P3f, Pcf, N1f, N2f,
                       Jf_out, hf_out, ln_out, Js, hs, acc, *, d, U, T1):
    b = pl.program_id(0)  # block of U consecutive time steps
    dd = d * d
    masked = (T1 % U) != 0  # time streams zero-padded to ceil(T1/U)*U

    @pl.when(b == 0)
    def _():
        Js[:] = J0[:]
        hs[:] = h0[:]
        acc[:] = jnp.zeros_like(acc)

    J = _rows(Js[:], dd)
    h = _rows(hs[:], d)
    a = acc[0, :]
    for u in range(U):
        p1 = _rows(P1f[u], dd)
        p2 = _rows(P2f[u], dd)
        p3 = _rows(P3f[u], dd)
        pc = Pcf[u][0]
        n1 = _rows(N1f[u], dd)
        n2 = _rows(N2f[u], d)

        M = ra.sub(J, ra.scale(p3, 2.0))
        L = ra.chol(M, d)
        v = ra.solve_lower(L, h, d)
        inc = (0.5 * d * LOG2PI - 0.5 * ra.logdet_from_chol(L, d)
               + 0.5 * ra.dot(v, v) + pc)
        w = ra.solve_upper(L, v, d)  # M^{-1} h
        Minv_p2T = ra.solve_upper_mat(
            L, ra.solve_lower_mat(L, ra.transpose(p2, d), d), d)
        J = ra.sub(ra.sub(ra.scale(p1, -2.0), ra.scale(n1, 2.0)),
                   ra.matmul(p2, Minv_p2T, d))
        h = ra.add(ra.matvec(p2, w, d), n2)
        if masked:
            # pad rows sit at the tail of the forward sweep: only the
            # running lognorm survives past them, so it alone is masked
            # (carry/outputs beyond T1 are sliced off by the caller).
            a = a + jnp.where(b * U + u < T1, inc, 0.0)
        else:
            a = a + inc
        Jf_out[u, :, :] = jnp.stack(J, axis=0)
        hf_out[u, :, :] = jnp.stack(h, axis=0)

    Js[:] = jnp.stack(J, axis=0)
    hs[:] = jnp.stack(h, axis=0)
    acc[0, :] = a
    ln_out[:] = acc[:]


def _backward_fwd_kernel(P1f, P2f, P3f, N1b, N2b, Jb_out, hb_out,
                         Js, hs, *, d, U, T1, G):
    s = pl.program_id(0)  # fetches block G-1-s; rows walked u = U-1..0
    dd = d * d
    masked = (T1 % U) != 0

    @pl.when(s == 0)
    def _():
        Js[:] = jnp.zeros_like(Js)
        hs[:] = jnp.zeros_like(hs)

    Jn = _rows(Js[:], dd)
    hn = _rows(hs[:], d)
    for u in reversed(range(U)):
        p1 = _rows(P1f[u], dd)
        p2 = _rows(P2f[u], dd)
        p3 = _rows(P3f[u], dd)
        n1 = _rows(N1b[u], dd)
        n2 = _rows(N2b[u], d)

        M = ra.add(ra.sub(ra.scale(p1, -2.0), ra.scale(n1, 2.0)), Jn)
        L = ra.chol(M, d)
        b = ra.add(hn, n2)
        w = ra.cho_solve(L, b, d)
        newh = ra.matvec_T(p2, w, d)
        Minv_p2 = ra.solve_upper_mat(L, ra.solve_lower_mat(L, p2, d), d)
        newJ = ra.sub(ra.scale(p3, -2.0), ra.matmul_TN(p2, Minv_p2, d))
        if masked:
            # the reverse sweep meets the zero-pad rows FIRST; the carry
            # (terminal beta message = 0) must survive them untouched.
            live = (G - 1 - s) * U + u < T1
            Jn = [jnp.where(live, x, y) for x, y in zip(newJ, Jn)]
            hn = [jnp.where(live, x, y) for x, y in zip(newh, hn)]
        else:
            Jn, hn = newJ, newh
        Jb_out[u, :, :] = jnp.stack(Jn, axis=0)
        hb_out[u, :, :] = jnp.stack(hn, axis=0)

    Js[:] = jnp.stack(Jn, axis=0)
    hs[:] = jnp.stack(hn, axis=0)


def _sampler_fwd_kernel(P2f, P3f, Jft, hft, epsf, xT, x_out, xs, *, d,
                        U, T1, G):
    s = pl.program_id(0)  # fetches block G-1-s; rows walked u = U-1..0
    dd = d * d
    masked = (T1 % U) != 0

    @pl.when(s == 0)
    def _():
        xs[:] = xT[:]

    x = _rows(xs[:], d)
    for u in reversed(range(U)):
        p2 = _rows(P2f[u], dd)
        p3 = _rows(P3f[u], dd)
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
            # pads come first on the reverse sweep; x must stay xT until
            # the first live row, else t = T-2 conditions on garbage.
            live = (G - 1 - s) * U + u < T1
            x = [jnp.where(live, a, c) for a, c in zip(newx, x)]
        else:
            x = newx
        x_out[u, :, :] = jnp.stack(x, axis=0)

    xs[:] = jnp.stack(x, axis=0)


# ==========================================================================
# fused filter + backward kernel (one pass, two independent recursions)
# ==========================================================================
#
# The forward and backward information filters are independent of each
# other (the smoother combines them only afterwards), and per-step time is
# bound by each recursion's serialized dependency chain rather than by
# issue bandwidth (the U-unroll measurement, see DEFAULT_UNROLL).
# Interleaving both recursions in ONE grid pass therefore overlaps their
# dependency stalls: the ascending (filter) streams and the descending
# (backward) streams are the same arrays passed twice with opposite
# BlockSpec index maps. This halves the kernel passes of the smoother
# (the SLDS mean-field sweeps' hot loop) and cuts the E-step forward from
# three passes to two.


def _fb_fwd_kernel(J0, h0, P1a, P2a, P3a, Pca, N1a, N2a,
                   P1d, P2d, P3d, N1d, N2d,
                   Jf_out, hf_out, ln_out, Jb_out, hb_out,
                   Jfs, hfs, acc, Jbs, hbs, *, d, U, T1, G):
    i = pl.program_id(0)  # filter block i (asc); backward block G-1-i
    dd = d * d
    masked = (T1 % U) != 0

    @pl.when(i == 0)
    def _():
        Jfs[:] = J0[:]
        hfs[:] = h0[:]
        acc[:] = jnp.zeros_like(acc)
        Jbs[:] = jnp.zeros_like(Jbs)
        hbs[:] = jnp.zeros_like(hbs)

    J = _rows(Jfs[:], dd)
    h = _rows(hfs[:], d)
    a = acc[0, :]
    Jn = _rows(Jbs[:], dd)
    hn = _rows(hbs[:], d)
    for u in range(U):
        # ---- forward filter step at t = i*U + u ----
        p1 = _rows(P1a[u], dd)
        p2 = _rows(P2a[u], dd)
        p3 = _rows(P3a[u], dd)
        pc = Pca[u][0]
        n1 = _rows(N1a[u], dd)
        n2 = _rows(N2a[u], d)
        M = ra.sub(J, ra.scale(p3, 2.0))
        L = ra.chol(M, d)
        v = ra.solve_lower(L, h, d)
        inc = (0.5 * d * LOG2PI - 0.5 * ra.logdet_from_chol(L, d)
               + 0.5 * ra.dot(v, v) + pc)
        w = ra.solve_upper(L, v, d)
        Minv_p2T = ra.solve_upper_mat(
            L, ra.solve_lower_mat(L, ra.transpose(p2, d), d), d)
        J = ra.sub(ra.sub(ra.scale(p1, -2.0), ra.scale(n1, 2.0)),
                   ra.matmul(p2, Minv_p2T, d))
        h = ra.add(ra.matvec(p2, w, d), n2)
        if masked:
            a = a + jnp.where(i * U + u < T1, inc, 0.0)
        else:
            a = a + inc
        Jf_out[u, :, :] = jnp.stack(J, axis=0)
        hf_out[u, :, :] = jnp.stack(h, axis=0)

        # ---- backward filter step at t = (G-1-i)*U + (U-1-u) ----
        ub = U - 1 - u
        q1 = _rows(P1d[ub], dd)
        q2 = _rows(P2d[ub], dd)
        q3 = _rows(P3d[ub], dd)
        m1 = _rows(N1d[ub], dd)
        m2 = _rows(N2d[ub], d)
        Mb = ra.add(ra.sub(ra.scale(q1, -2.0), ra.scale(m1, 2.0)), Jn)
        Lb = ra.chol(Mb, d)
        bb = ra.add(hn, m2)
        wb = ra.cho_solve(Lb, bb, d)
        newh = ra.matvec_T(q2, wb, d)
        Minv_q2 = ra.solve_upper_mat(Lb, ra.solve_lower_mat(Lb, q2, d), d)
        newJ = ra.sub(ra.scale(q3, -2.0), ra.matmul_TN(q2, Minv_q2, d))
        if masked:
            live = (G - 1 - i) * U + ub < T1
            Jn = [jnp.where(live, x, y) for x, y in zip(newJ, Jn)]
            hn = [jnp.where(live, x, y) for x, y in zip(newh, hn)]
        else:
            Jn, hn = newJ, newh
        Jb_out[ub, :, :] = jnp.stack(Jn, axis=0)
        hb_out[ub, :, :] = jnp.stack(hn, axis=0)

    Jfs[:] = jnp.stack(J, axis=0)
    hfs[:] = jnp.stack(h, axis=0)
    acc[0, :] = a
    ln_out[:] = acc[:]
    Jbs[:] = jnp.stack(Jn, axis=0)
    hbs[:] = jnp.stack(hn, axis=0)


# ==========================================================================
# adjoint kernels (hand-derived; see module docstring)
# ==========================================================================


def _filter_adj_kernel(P2f, P3f, Jft, hft, dJf, dhf, lam,
                       dG_out, dg_out, dP2_out, dM_out, dJ0_out, dh0_out,
                       cJ, ch, *, d, U, T1, G_):
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
        G = ra.add(Mc, _rows(dJf[u_i], dd))
        g = ra.add(hc, _rows(dhf[u_i], d))
        p2 = _rows(P2f[u_i], dd)
        p3 = _rows(P3f[u_i], dd)
        J = _rows(Jft[u_i], dd)
        h = _rows(hft[u_i], d)
        lv = lam[0]  # (B,) lognorm cotangent

        M = ra.sub(J, ra.scale(p3, 2.0))
        L = ra.chol(M, d)
        W = ra.cho_inverse(L, d)
        w = ra.matvec(W, h, d)
        u = ra.matvec_T(p2, g, d)  # P2^T g
        hbar = [lv * wi + x for wi, x in zip(w, ra.matvec(W, u, d))]
        Wbar = ra.add(
            ra.add(ra.scale(ra.matmul(ra.matmul_TN(p2, G, d), p2, d),
                            -1.0),
                   ra.outer(u, h, d)),
            [0.5 * lv * e for e in ra.outer(h, h, d)])
        Mbar = ra.sub(
            ra.scale(ra.matmul(ra.matmul(W, Wbar, d), W, d), -1.0),
            [0.5 * lv * e for e in W])
        Mbar = ra.sym(Mbar, d)
        Gsym = ra.add(G, ra.transpose(G, d))
        dP2 = ra.add(
            ra.scale(ra.matmul(Gsym, ra.matmul(p2, W, d), d), -1.0),
            ra.outer(g, w, d))

        _store_u(dG_out, u_i, G)
        _store_u(dg_out, u_i, g)
        _store_u(dP2_out, u_i, dP2)
        _store_u(dM_out, u_i, Mbar)
        if masked:
            # reverse sweep: zero carry must ride through the pad rows
            live = (G_ - 1 - s) * U + u_i < T1
            Mc = [jnp.where(live, x, y) for x, y in zip(Mbar, Mc)]
            hc = [jnp.where(live, x, y) for x, y in zip(hbar, hc)]
        else:
            Mc, hc = Mbar, hbar

    cJ[:] = jnp.stack(Mc, axis=0)
    ch[:] = jnp.stack(hc, axis=0)
    dJ0_out[:] = cJ[:]
    dh0_out[:] = ch[:]


def _backward_adj_kernel(P1f, P2f, N1b, N2b, Jbn, hbn, dJb, dhb,
                         dG_out, dP2_out, dM_out, db_out, cJ, ch, *, d, U):
    t = pl.program_id(0)  # forward in time (reverse of the fwd kernel)
    dd = d * d
    # no masking needed: this sweep runs FORWARD, so zero-pad rows come
    # last -- nothing live reads the carry after them and there are no
    # end-of-sweep whole outputs.

    @pl.when(t == 0)
    def _():
        cJ[:] = jnp.zeros_like(cJ)
        ch[:] = jnp.zeros_like(ch)

    Mc = _rows(cJ[:], dd)
    hc = _rows(ch[:], d)
    for u_i in range(U):
        G = ra.add(Mc, _rows(dJb[u_i], dd))
        g = ra.add(hc, _rows(dhb[u_i], d))
        p1 = _rows(P1f[u_i], dd)
        p2 = _rows(P2f[u_i], dd)
        n1 = _rows(N1b[u_i], dd)
        n2 = _rows(N2b[u_i], d)
        Jn = _rows(Jbn[u_i], dd)
        hn = _rows(hbn[u_i], d)

        M = ra.add(ra.sub(ra.scale(p1, -2.0), ra.scale(n1, 2.0)), Jn)
        L = ra.chol(M, d)
        W = ra.cho_inverse(L, d)
        b = ra.add(hn, n2)
        w = ra.matvec(W, b, d)
        u = ra.matvec(p2, g, d)  # P2 g  (wbar)
        bbar = ra.matvec(W, u, d)
        Wbar = ra.add(
            ra.scale(ra.matmul_NT(ra.matmul(p2, G, d), p2, d), -1.0),
            ra.outer(u, b, d))
        Mbar = ra.sym(
            ra.scale(ra.matmul(ra.matmul(W, Wbar, d), W, d), -1.0), d)
        Gsym = ra.add(G, ra.transpose(G, d))
        dP2 = ra.add(
            ra.scale(ra.matmul(ra.matmul(W, p2, d), Gsym, d), -1.0),
            ra.outer(w, g, d))

        _store_u(dG_out, u_i, G)
        _store_u(dP2_out, u_i, dP2)
        _store_u(dM_out, u_i, Mbar)
        _store_u(db_out, u_i, bbar)
        Mc, hc = Mbar, bbar

    cJ[:] = jnp.stack(Mc, axis=0)
    ch[:] = jnp.stack(hc, axis=0)


def _sampler_adj_kernel(P2f, P3f, Jft, hft, xb, xnext, dx,
                        dJc_out, dhf_out, dP2_out, dxT_out, cx, *, d,
                        U, T1):
    t = pl.program_id(0)  # forward in time
    dd = d * d
    masked = (T1 % U) != 0

    @pl.when(t == 0)
    def _():
        cx[:] = jnp.zeros_like(cx)

    xc = _rows(cx[:], d)
    for u_i in range(U):
        xbar = ra.add(xc, _rows(dx[u_i], d))
        p2 = _rows(P2f[u_i], dd)
        p3 = _rows(P3f[u_i], dd)
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
        bbar = ra.solve_upper(L, u, d)  # Jc^{-1} xbar, reusing the half-solve
        Lbar = ra.scale(ra.tril(ra.outer(z, u, d), d), -1.0)
        Jc_bar = ra.sym(
            ra.add(ra.scale(ra.outer(bbar, mu, d), -1.0),
                   ra.chol_vjp(L, Lbar, d)), d)
        dP2 = ra.outer(x_n, bbar, d)

        _store_u(dJc_out, u_i, Jc_bar)
        _store_u(dhf_out, u_i, bbar)
        _store_u(dP2_out, u_i, dP2)
        newx = ra.matvec(p2, bbar, d)
        if masked:
            # dxT_out is read AFTER the tail pad rows of this forward
            # sweep: the carry must not be clobbered by them.
            xc = [jnp.where(t * U + u_i < T1, a, c)
                  for a, c in zip(newx, xc)]
        else:
            xc = newx

    cx[:] = jnp.stack(xc, axis=0)
    dxT_out[:] = cx[:]


def _fb_adj_kernel(P2d, P3d, Jtd, htd, dJfd, dhfd, lam,
                   P1a, P2a, N1a, N2a, Jbna, hbna, dJba, dhba,
                   dGf_out, dgf_out, dP2f_out, dMf_out, dJ0_out, dh0_out,
                   dGb_out, dP2b_out, dMb_out, dbb_out,
                   cJf, chf, cJb, chb, *, d, U, T1, G_):
    """Fused adjoint of ``_fb_fwd_kernel``: the filter adjoint sweeps
    DESCENDING (its streams arrive via reversed index maps, carry masked
    through the tail pads it meets first) while the backward-filter
    adjoint sweeps ASCENDING (pads last, no masking needed) -- the same
    interleaving argument as the forward fusion."""
    s = pl.program_id(0)
    dd = d * d
    masked = (T1 % U) != 0

    @pl.when(s == 0)
    def _():
        cJf[:] = jnp.zeros_like(cJf)
        chf[:] = jnp.zeros_like(chf)
        cJb[:] = jnp.zeros_like(cJb)
        chb[:] = jnp.zeros_like(chb)

    Mcf = _rows(cJf[:], dd)
    hcf = _rows(chf[:], d)
    Mcb = _rows(cJb[:], dd)
    hcb = _rows(chb[:], d)
    for u in range(U):
        # ---- filter adjoint at t = (G_-1-s)*U + (U-1-u) (descending) ----
        uf = U - 1 - u
        G = ra.add(Mcf, _rows(dJfd[uf], dd))
        g = ra.add(hcf, _rows(dhfd[uf], d))
        p2 = _rows(P2d[uf], dd)
        p3 = _rows(P3d[uf], dd)
        J = _rows(Jtd[uf], dd)
        h = _rows(htd[uf], d)
        lv = lam[0]
        M = ra.sub(J, ra.scale(p3, 2.0))
        L = ra.chol(M, d)
        W = ra.cho_inverse(L, d)
        w = ra.matvec(W, h, d)
        uvec = ra.matvec_T(p2, g, d)
        hbar = [lv * wi + x for wi, x in zip(w, ra.matvec(W, uvec, d))]
        Wbar = ra.add(
            ra.add(ra.scale(ra.matmul(ra.matmul_TN(p2, G, d), p2, d),
                            -1.0),
                   ra.outer(uvec, h, d)),
            [0.5 * lv * e for e in ra.outer(h, h, d)])
        Mbar = ra.sub(
            ra.scale(ra.matmul(ra.matmul(W, Wbar, d), W, d), -1.0),
            [0.5 * lv * e for e in W])
        Mbar = ra.sym(Mbar, d)
        Gsym = ra.add(G, ra.transpose(G, d))
        dP2f = ra.add(
            ra.scale(ra.matmul(Gsym, ra.matmul(p2, W, d), d), -1.0),
            ra.outer(g, w, d))
        _store_u(dGf_out, uf, G)
        _store_u(dgf_out, uf, g)
        _store_u(dP2f_out, uf, dP2f)
        _store_u(dMf_out, uf, Mbar)
        if masked:
            live = (G_ - 1 - s) * U + uf < T1
            Mcf = [jnp.where(live, x, y) for x, y in zip(Mbar, Mcf)]
            hcf = [jnp.where(live, x, y) for x, y in zip(hbar, hcf)]
        else:
            Mcf, hcf = Mbar, hbar

        # ---- backward-filter adjoint at t = s*U + u (ascending) ----
        Gb = ra.add(Mcb, _rows(dJba[u], dd))
        gb = ra.add(hcb, _rows(dhba[u], d))
        q1 = _rows(P1a[u], dd)
        q2 = _rows(P2a[u], dd)
        m1 = _rows(N1a[u], dd)
        m2 = _rows(N2a[u], d)
        Jn = _rows(Jbna[u], dd)
        hn = _rows(hbna[u], d)
        Mb = ra.add(ra.sub(ra.scale(q1, -2.0), ra.scale(m1, 2.0)), Jn)
        Lb = ra.chol(Mb, d)
        Wb = ra.cho_inverse(Lb, d)
        bvec = ra.add(hn, m2)
        wb = ra.matvec(Wb, bvec, d)
        ub2 = ra.matvec(q2, gb, d)
        bbar = ra.matvec(Wb, ub2, d)
        Wbbar = ra.add(
            ra.scale(ra.matmul_NT(ra.matmul(q2, Gb, d), q2, d), -1.0),
            ra.outer(ub2, bvec, d))
        Mbbar = ra.sym(
            ra.scale(ra.matmul(ra.matmul(Wb, Wbbar, d), Wb, d), -1.0), d)
        Gbsym = ra.add(Gb, ra.transpose(Gb, d))
        dP2b = ra.add(
            ra.scale(ra.matmul(ra.matmul(Wb, q2, d), Gbsym, d), -1.0),
            ra.outer(wb, gb, d))
        _store_u(dGb_out, u, Gb)
        _store_u(dP2b_out, u, dP2b)
        _store_u(dMb_out, u, Mbbar)
        _store_u(dbb_out, u, bbar)
        Mcb, hcb = Mbbar, bbar

    cJf[:] = jnp.stack(Mcf, axis=0)
    chf[:] = jnp.stack(hcf, axis=0)
    dJ0_out[:] = cJf[:]
    dh0_out[:] = chf[:]
    cJb[:] = jnp.stack(Mcb, axis=0)
    chb[:] = jnp.stack(hcb, axis=0)


# ==========================================================================
# pallas_call plumbing
# ==========================================================================


# XLA:TPU may stage whole custom-call operands in VMEM when each fits
# individually; with U-step blocks the default 16M scoped-vmem budget is
# tight for the 8-operand adjoint calls, so raise the per-kernel limit.
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
    """(G, Tp): grid length and padded stream length for U-step blocks."""
    G = -(-T1 // U)
    return G, G * U


def _pad_time(x, Tp):
    """Zero-pad the leading (time) axis to ``Tp`` rows (the kernels mask
    the pad rows; see the per-kernel notes)."""
    T1 = x.shape[0]
    if Tp == T1:
        return x
    z = jnp.zeros((Tp - T1,) + x.shape[1:], x.dtype)
    return jnp.concatenate([x, z], axis=0)


def _filter_fwd_call(J0, h0, P1f, P2f, P3f, Pcf, N1f, N2f, *, d, U,
                     interpret):
    T1, dd, Bp = P1f.shape
    dt = J0.dtype
    G, Tp = _grid_of(T1, U)
    P1f, P2f, P3f, Pcf, N1f, N2f = (
        _pad_time(x, Tp) for x in (P1f, P2f, P3f, Pcf, N1f, N2f))
    Jf, hf, ln = pl.pallas_call(
        functools.partial(_filter_fwd_kernel, d=d, U=U, T1=T1),
        grid=(G,),
        in_specs=[_whole(), _whole(), _blk(U, dd, Bp), _blk(U, dd, Bp),
                  _blk(U, dd, Bp), _blk(U, 1, Bp), _blk(U, dd, Bp),
                  _blk(U, d, Bp)],
        out_specs=[_blk(U, dd, Bp), _blk(U, d, Bp), _whole()],
        out_shape=[jax.ShapeDtypeStruct((Tp, dd, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, d, Bp), dt),
                   jax.ShapeDtypeStruct((1, Bp), dt)],
        scratch_shapes=[pltpu.VMEM((dd, Bp), dt), pltpu.VMEM((d, Bp), dt),
                        pltpu.VMEM((1, Bp), dt)],
        compiler_params=_PARAMS,
        interpret=interpret,
    )(J0, h0, P1f, P2f, P3f, Pcf, N1f, N2f)
    return Jf[:T1], hf[:T1], ln


def _filter_adj_call(P2f, P3f, Jft, hft, dJf, dhf, lam, *, d, U,
                     interpret):
    T1, dd, Bp = P2f.shape
    dt = Jft.dtype
    G, Tp = _grid_of(T1, U)
    r = G - 1
    P2f, P3f, Jft, hft, dJf, dhf = (
        _pad_time(x, Tp) for x in (P2f, P3f, Jft, hft, dJf, dhf))
    out = pl.pallas_call(
        functools.partial(_filter_adj_kernel, d=d, U=U, T1=T1, G_=G),
        grid=(G,),
        in_specs=[_blk(U, dd, Bp, r), _blk(U, dd, Bp, r),
                  _blk(U, dd, Bp, r), _blk(U, d, Bp, r),
                  _blk(U, dd, Bp, r), _blk(U, d, Bp, r), _whole()],
        out_specs=[_blk(U, dd, Bp, r), _blk(U, d, Bp, r),
                   _blk(U, dd, Bp, r), _blk(U, dd, Bp, r), _whole(),
                   _whole()],
        out_shape=[jax.ShapeDtypeStruct((Tp, dd, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, d, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, dd, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, dd, Bp), dt),
                   jax.ShapeDtypeStruct((dd, Bp), dt),
                   jax.ShapeDtypeStruct((d, Bp), dt)],
        scratch_shapes=[pltpu.VMEM((dd, Bp), dt), pltpu.VMEM((d, Bp), dt)],
        compiler_params=_PARAMS,
        interpret=interpret,
    )(P2f, P3f, Jft, hft, dJf, dhf, lam)
    return tuple(x[:T1] for x in out[:4]) + tuple(out[4:])


def _backward_fwd_call(P1f, P2f, P3f, N1b, N2b, *, d, U, interpret):
    T1, dd, Bp = P1f.shape
    dt = N2b.dtype
    G, Tp = _grid_of(T1, U)
    r = G - 1
    P1f, P2f, P3f, N1b, N2b = (
        _pad_time(x, Tp) for x in (P1f, P2f, P3f, N1b, N2b))
    Jb, hb = pl.pallas_call(
        functools.partial(_backward_fwd_kernel, d=d, U=U, T1=T1, G=G),
        grid=(G,),
        in_specs=[_blk(U, dd, Bp, r), _blk(U, dd, Bp, r),
                  _blk(U, dd, Bp, r), _blk(U, dd, Bp, r),
                  _blk(U, d, Bp, r)],
        out_specs=[_blk(U, dd, Bp, r), _blk(U, d, Bp, r)],
        out_shape=[jax.ShapeDtypeStruct((Tp, dd, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, d, Bp), dt)],
        scratch_shapes=[pltpu.VMEM((dd, Bp), dt), pltpu.VMEM((d, Bp), dt)],
        compiler_params=_PARAMS,
        interpret=interpret,
    )(P1f, P2f, P3f, N1b, N2b)
    return Jb[:T1], hb[:T1]


def _backward_adj_call(P1f, P2f, N1b, N2b, Jbn, hbn, dJb, dhb, *, d, U,
                       interpret):
    T1, dd, Bp = P1f.shape
    dt = N2b.dtype
    G, Tp = _grid_of(T1, U)
    P1f, P2f, N1b, N2b, Jbn, hbn, dJb, dhb = (
        _pad_time(x, Tp) for x in (P1f, P2f, N1b, N2b, Jbn, hbn, dJb, dhb))
    out = pl.pallas_call(
        functools.partial(_backward_adj_kernel, d=d, U=U),
        grid=(G,),
        in_specs=[_blk(U, dd, Bp), _blk(U, dd, Bp), _blk(U, dd, Bp),
                  _blk(U, d, Bp), _blk(U, dd, Bp), _blk(U, d, Bp),
                  _blk(U, dd, Bp), _blk(U, d, Bp)],
        out_specs=[_blk(U, dd, Bp), _blk(U, dd, Bp), _blk(U, dd, Bp),
                   _blk(U, d, Bp)],
        out_shape=[jax.ShapeDtypeStruct((Tp, dd, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, dd, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, dd, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, d, Bp), dt)],
        scratch_shapes=[pltpu.VMEM((dd, Bp), dt), pltpu.VMEM((d, Bp), dt)],
        compiler_params=_PARAMS,
        interpret=interpret,
    )(P1f, P2f, N1b, N2b, Jbn, hbn, dJb, dhb)
    return tuple(x[:T1] for x in out)


def _sampler_fwd_call(P2f, P3f, Jft, hft, epsf, xT, *, d, U, interpret):
    T1, dd, Bp = P2f.shape
    dt = xT.dtype
    G, Tp = _grid_of(T1, U)
    r = G - 1
    P2f, P3f, Jft, hft, epsf = (
        _pad_time(x, Tp) for x in (P2f, P3f, Jft, hft, epsf))
    xb = pl.pallas_call(
        functools.partial(_sampler_fwd_kernel, d=d, U=U, T1=T1, G=G),
        grid=(G,),
        in_specs=[_blk(U, dd, Bp, r), _blk(U, dd, Bp, r),
                  _blk(U, dd, Bp, r), _blk(U, d, Bp, r),
                  _blk(U, d, Bp, r), _whole()],
        out_specs=_blk(U, d, Bp, r),
        out_shape=jax.ShapeDtypeStruct((Tp, d, Bp), dt),
        scratch_shapes=[pltpu.VMEM((d, Bp), dt)],
        compiler_params=_PARAMS,
        interpret=interpret,
    )(P2f, P3f, Jft, hft, epsf, xT)
    return xb[:T1]


def _fb_fwd_call(J0, h0, P1f, P2f, P3f, Pcf, N1f, N2f, *, d, U,
                 interpret):
    T1, dd, Bp = P1f.shape
    dt = J0.dtype
    G, Tp = _grid_of(T1, U)
    r = G - 1
    P1f, P2f, P3f, Pcf, N1f, N2f = (
        _pad_time(x, Tp) for x in (P1f, P2f, P3f, Pcf, N1f, N2f))
    a = lambda m: _blk(U, m, Bp)          # ascending (filter) streams
    dsc = lambda m: _blk(U, m, Bp, rev=r)  # descending (backward) streams
    Jf, hf, ln, Jb, hb = pl.pallas_call(
        functools.partial(_fb_fwd_kernel, d=d, U=U, T1=T1, G=G),
        grid=(G,),
        in_specs=[_whole(), _whole(),
                  a(dd), a(dd), a(dd), a(1), a(dd), a(d),
                  dsc(dd), dsc(dd), dsc(dd), dsc(dd), dsc(d)],
        out_specs=[a(dd), a(d), _whole(), dsc(dd), dsc(d)],
        out_shape=[jax.ShapeDtypeStruct((Tp, dd, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, d, Bp), dt),
                   jax.ShapeDtypeStruct((1, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, dd, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, d, Bp), dt)],
        scratch_shapes=[pltpu.VMEM((dd, Bp), dt), pltpu.VMEM((d, Bp), dt),
                        pltpu.VMEM((1, Bp), dt),
                        pltpu.VMEM((dd, Bp), dt), pltpu.VMEM((d, Bp), dt)],
        compiler_params=_PARAMS,
        interpret=interpret,
    )(J0, h0, P1f, P2f, P3f, Pcf, N1f, N2f, P1f, P2f, P3f, N1f, N2f)
    return Jf[:T1], hf[:T1], ln, Jb[:T1], hb[:T1]


def _fb_adj_call(P2f, P3f, Jft, hft, dJf, dhf, lam,
                 P1f, N1f, N2f, Jbn, hbn, dJb, dhb, *, d, U, interpret):
    T1, dd, Bp = P2f.shape
    dt = Jft.dtype
    G, Tp = _grid_of(T1, U)
    r = G - 1
    (P2f, P3f, Jft, hft, dJf, dhf, P1f, N1f, N2f, Jbn, hbn, dJb,
     dhb) = (_pad_time(x, Tp) for x in
             (P2f, P3f, Jft, hft, dJf, dhf, P1f, N1f, N2f, Jbn, hbn,
              dJb, dhb))
    a = lambda m: _blk(U, m, Bp)
    dsc = lambda m: _blk(U, m, Bp, rev=r)
    out = pl.pallas_call(
        functools.partial(_fb_adj_kernel, d=d, U=U, T1=T1, G_=G),
        grid=(G,),
        in_specs=[dsc(dd), dsc(dd), dsc(dd), dsc(d), dsc(dd), dsc(d),
                  _whole(),
                  a(dd), a(dd), a(dd), a(d), a(dd), a(d), a(dd), a(d)],
        out_specs=[dsc(dd), dsc(d), dsc(dd), dsc(dd), _whole(), _whole(),
                   a(dd), a(dd), a(dd), a(d)],
        out_shape=[jax.ShapeDtypeStruct((Tp, dd, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, d, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, dd, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, dd, Bp), dt),
                   jax.ShapeDtypeStruct((dd, Bp), dt),
                   jax.ShapeDtypeStruct((d, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, dd, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, dd, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, dd, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, d, Bp), dt)],
        scratch_shapes=[pltpu.VMEM((dd, Bp), dt), pltpu.VMEM((d, Bp), dt),
                        pltpu.VMEM((dd, Bp), dt), pltpu.VMEM((d, Bp), dt)],
        compiler_params=_PARAMS,
        interpret=interpret,
    )(P2f, P3f, Jft, hft, dJf, dhf, lam,
      P1f, P2f, N1f, N2f, Jbn, hbn, dJb, dhb)
    sliced = tuple(x[:T1] for x in out[:4]) + tuple(out[4:6])
    return sliced + tuple(x[:T1] for x in out[6:])


def _sampler_adj_call(P2f, P3f, Jft, hft, xb, xnext, dx, *, d, U,
                      interpret):
    T1, dd, Bp = P2f.shape
    dt = xb.dtype
    G, Tp = _grid_of(T1, U)
    P2f, P3f, Jft, hft, xb, xnext, dx = (
        _pad_time(x, Tp) for x in (P2f, P3f, Jft, hft, xb, xnext, dx))
    out = pl.pallas_call(
        functools.partial(_sampler_adj_kernel, d=d, U=U, T1=T1),
        grid=(G,),
        in_specs=[_blk(U, dd, Bp), _blk(U, dd, Bp), _blk(U, dd, Bp),
                  _blk(U, d, Bp), _blk(U, d, Bp), _blk(U, d, Bp),
                  _blk(U, d, Bp)],
        out_specs=[_blk(U, dd, Bp), _blk(U, d, Bp), _blk(U, dd, Bp),
                   _whole()],
        out_shape=[jax.ShapeDtypeStruct((Tp, dd, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, d, Bp), dt),
                   jax.ShapeDtypeStruct((Tp, dd, Bp), dt),
                   jax.ShapeDtypeStruct((d, Bp), dt)],
        scratch_shapes=[pltpu.VMEM((d, Bp), dt)],
        compiler_params=_PARAMS,
        interpret=interpret,
    )(P2f, P3f, Jft, hft, xb, xnext, dx)
    return tuple(x[:T1] for x in out[:3]) + (out[3],)


# ==========================================================================
# custom-VJP primitives (packed layout)
# ==========================================================================


# U-step time unroll, measured on-chip (v5e, B=64 T=100 d=10, f32,
# 2026-08-17). Separate filter+backward passes: E-step fwd/grad ms at
# U=1: 2.73/4.31, U=4: 2.60/4.13, U=8: 3.33/4.23, U=16: 2.59/5.13.
# With the fused forward pass (fb_pass, the production path): U=1:
# 2.27/4.23, U=4: 2.39/4.29 -- outputs bit-identical across U. The chain
# is bound by the serialized step math, not per-grid-step overhead, so
# unrolling buys nothing once the forward passes are fused; U=1 also
# compiles ~3x faster.
DEFAULT_UNROLL = 1


def _resolve_unroll(interpret, unroll):
    """``None`` -> production default on hardware, 1 under the (slow to
    compile) CPU interpreter; explicit values are always honored."""
    if unroll is not None:
        return max(1, int(unroll))
    return 1 if interpret else DEFAULT_UNROLL


@functools.lru_cache(maxsize=8)
def _prims(d, interpret, U, fused_adj=False):
    """Build the four custom-VJP primitives for (d, interpret, unroll);
    ``fused_adj`` selects the fused mixed-direction adjoint kernel for
    ``fb_prim`` (measured slower -- see ``fb_bwd`` -- kept reachable for
    benchmarking and tested for parity)."""

    @jax.custom_vjp
    def filter_prim(J0, h0, P1f, P2f, P3f, Pcf, N1f, N2f):
        return _filter_fwd_call(J0, h0, P1f, P2f, P3f, Pcf, N1f, N2f,
                                d=d, U=U, interpret=interpret)

    def filter_fwd(J0, h0, P1f, P2f, P3f, Pcf, N1f, N2f):
        out = _filter_fwd_call(J0, h0, P1f, P2f, P3f, Pcf, N1f, N2f,
                               d=d, U=U, interpret=interpret)
        Jf_tail, hf_tail, _ = out
        Jft = jnp.concatenate([J0[None], Jf_tail[:-1]], axis=0)
        hft = jnp.concatenate([h0[None], hf_tail[:-1]], axis=0)
        return out, (P2f, P3f, Jft, hft)

    def filter_bwd(res, cots):
        P2f, P3f, Jft, hft = res
        dJf, dhf, dln = cots
        T1 = P2f.shape[0]
        dG, dg, dP2, dM, dJ0, dh0 = _filter_adj_call(
            P2f, P3f, Jft, hft, dJf, dhf, dln, d=d, U=U,
            interpret=interpret)
        dP1 = -2.0 * dG
        dP3 = -2.0 * dM
        dPc = jnp.broadcast_to(dln[None], (T1,) + dln.shape)
        dN1 = -2.0 * dG
        dN2 = dg
        return (dJ0, dh0, dP1, dP2, dP3, dPc, dN1, dN2)

    filter_prim.defvjp(filter_fwd, filter_bwd)

    @jax.custom_vjp
    def backward_prim(P1f, P2f, P3f, N1b, N2b):
        return _backward_fwd_call(P1f, P2f, P3f, N1b, N2b, d=d, U=U,
                                  interpret=interpret)

    def backward_fwd(P1f, P2f, P3f, N1b, N2b):
        out = _backward_fwd_call(P1f, P2f, P3f, N1b, N2b, d=d, U=U,
                                 interpret=interpret)
        Jb_body, hb_body = out
        zJ = jnp.zeros_like(Jb_body[:1])
        zh = jnp.zeros_like(hb_body[:1])
        Jbn = jnp.concatenate([Jb_body[1:], zJ], axis=0)
        hbn = jnp.concatenate([hb_body[1:], zh], axis=0)
        return out, (P1f, P2f, N1b, N2b, Jbn, hbn)

    def backward_bwd(res, cots):
        P1f, P2f, N1b, N2b, Jbn, hbn = res
        dJb, dhb = cots
        dG, dP2, dM, db = _backward_adj_call(
            P1f, P2f, N1b, N2b, Jbn, hbn, dJb, dhb, d=d, U=U,
            interpret=interpret)
        return (-2.0 * dM, dP2, -2.0 * dG, -2.0 * dM, db)

    backward_prim.defvjp(backward_fwd, backward_bwd)

    @jax.custom_vjp
    def sampler_prim(P2f, P3f, Jft, hft, epsf, xT):
        return _sampler_fwd_call(P2f, P3f, Jft, hft, epsf, xT, d=d, U=U,
                                 interpret=interpret)

    def sampler_fwd(P2f, P3f, Jft, hft, epsf, xT):
        xb = _sampler_fwd_call(P2f, P3f, Jft, hft, epsf, xT, d=d, U=U,
                               interpret=interpret)
        return xb, (P2f, P3f, Jft, hft, xb, xT)

    def sampler_bwd(res, dx):
        P2f, P3f, Jft, hft, xb, xT = res
        xnext = jnp.concatenate([xb[1:], xT[None]], axis=0)
        dJc, dhf, dP2, dxT = _sampler_adj_call(
            P2f, P3f, Jft, hft, xb, xnext, dx, d=d, U=U,
            interpret=interpret)
        return (dP2, -2.0 * dJc, dJc, dhf, jnp.zeros_like(dx), dxT)

    sampler_prim.defvjp(sampler_fwd, sampler_bwd)

    @jax.custom_vjp
    def fb_prim(J0, h0, P1f, P2f, P3f, Pcf, N1f, N2f):
        return _fb_fwd_call(J0, h0, P1f, P2f, P3f, Pcf, N1f, N2f,
                            d=d, U=U, interpret=interpret)

    def fb_fwd(J0, h0, P1f, P2f, P3f, Pcf, N1f, N2f):
        out = _fb_fwd_call(J0, h0, P1f, P2f, P3f, Pcf, N1f, N2f,
                           d=d, U=U, interpret=interpret)
        Jf_tail, hf_tail, _, Jb_body, hb_body = out
        Jft = jnp.concatenate([J0[None], Jf_tail[:-1]], axis=0)
        hft = jnp.concatenate([h0[None], hf_tail[:-1]], axis=0)
        zJ = jnp.zeros_like(Jb_body[:1])
        zh = jnp.zeros_like(hb_body[:1])
        Jbn = jnp.concatenate([Jb_body[1:], zJ], axis=0)
        hbn = jnp.concatenate([hb_body[1:], zh], axis=0)
        return out, (P1f, P2f, P3f, Jft, hft, N1f, N2f, Jbn, hbn)

    def fb_bwd(res, cots):
        P1f, P2f, P3f, Jft, hft, N1f, N2f, Jbn, hbn = res
        dJf, dhf, dln, dJb, dhb = cots
        T1 = P2f.shape[0]
        # Adjoints run as the two SEPARATE kernels by default: measured
        # on-chip (B=64 T=100 d=10 U=4), the fused forward wins (~10%:
        # E-step fwd 2.60 -> 2.34 ms) but the fused mixed-direction
        # adjoint loses slightly (grad 4.13 -> 4.38 ms; its 15-operand
        # block working set erases the interleaving gain), so only the
        # forward side is fused.
        if fused_adj:
            (dGf, dgf, dP2f, dMf, dJ0, dh0,
             dGb, dP2b, dMb, dbb) = _fb_adj_call(
                P2f, P3f, Jft, hft, dJf, dhf, dln,
                P1f, N1f, N2f, Jbn, hbn, dJb, dhb, d=d, U=U,
                interpret=interpret)
        else:
            dGf, dgf, dP2f, dMf, dJ0, dh0 = _filter_adj_call(
                P2f, P3f, Jft, hft, dJf, dhf, dln, d=d, U=U,
                interpret=interpret)
            dGb, dP2b, dMb, dbb = _backward_adj_call(
                P1f, P2f, N1f, N2f, Jbn, hbn, dJb, dhb, d=d, U=U,
                interpret=interpret)
        # same input-cotangent algebra as filter_bwd + backward_bwd,
        # summed over the two recursions' shared operands
        dP1 = -2.0 * dGf - 2.0 * dMb
        dP2 = dP2f + dP2b
        dP3 = -2.0 * dMf - 2.0 * dGb
        dPc = jnp.broadcast_to(dln[None], (T1,) + dln.shape)
        dN1 = -2.0 * dGf - 2.0 * dMb
        dN2 = dgf + dbb
        return (dJ0, dh0, dP1, dP2, dP3, dPc, dN1, dN2)

    fb_prim.defvjp(fb_fwd, fb_bwd)

    return filter_prim, backward_prim, sampler_prim, fb_prim


# ==========================================================================
# packing glue (differentiable XLA; transposes handle pad/broadcast)
# ==========================================================================


def _pad_batch(x, pad, fill):
    """Pad the leading batch axis with ``fill`` (broadcast to the trailing
    shape)."""
    if pad == 0:
        return x
    f = jnp.broadcast_to(fill, (pad,) + x.shape[1:]).astype(x.dtype)
    return jnp.concatenate([x, f], axis=0)


def _pack(x, m):
    """(Bp, T, ...) -> (T, m, Bp)."""
    Bp, T = x.shape[:2]
    return jnp.moveaxis(x.reshape(Bp, T, m), 0, -1)


def _unpack(x, shape_tail):
    """(T, m, Bp) -> (Bp, T, *shape_tail)."""
    T, m, Bp = x.shape
    return jnp.moveaxis(x, -1, 0).reshape((Bp, T) + shape_tail)


def _prep_chain(pairs, nodes, block_b):
    """Broadcast shared pairs over the batch, pad lanes, pack everything.

    Returns (packed dict, B, T, d, Bp)."""
    P1, P2, P3, Pc = pairs
    N1, N2 = nodes
    B, T, d = N2.shape
    dt = N2.dtype
    if P1.ndim == 3:  # shared pairs -> broadcast (cotangents sum over B)
        P1 = jnp.broadcast_to(P1[None], (B,) + P1.shape)
        P2 = jnp.broadcast_to(P2[None], (B,) + P2.shape)
        P3 = jnp.broadcast_to(P3[None], (B,) + P3.shape)
        Pc = jnp.broadcast_to(Pc[None], (B,) + Pc.shape)

    pad = (-B) % block_b
    eye = jnp.eye(d, dtype=dt)
    N1 = _pad_batch(N1, pad, -0.5 * eye)
    N2 = _pad_batch(N2, pad, jnp.zeros((), dt))
    P1 = _pad_batch(P1, pad, -0.5 * eye)
    P2 = _pad_batch(P2, pad, jnp.zeros((), dt))
    P3 = _pad_batch(P3, pad, -0.5 * eye)
    Pc = _pad_batch(Pc, pad, jnp.zeros((), dt))
    Bp = B + pad

    packed = dict(
        P1f=_pack(P1, d * d), P2f=_pack(P2, d * d), P3f=_pack(P3, d * d),
        Pcf=_pack(Pc[..., None], 1),
        N1f=_pack(N1[:, 1:], d * d), N2f=_pack(N2[:, 1:], d),
        N1_0=N1[:, 0], N2_0=N2[:, 0],
    )
    return packed, B, T, d, Bp


# ==========================================================================
# differentiable public entry points
# ==========================================================================


def lds_filter(init, pairs, nodes, block_b=128, interpret=False,
               unroll=None):
    """Forward filter, differentiable: (logZ (B,), Jf (B,T,d,d),
    hf (B,T,d)). ``pairs`` may be shared (T-1, ...) or per-sequence
    (B, T-1, ...); nodes are per-sequence. Matches ``kalman.lds_filter``
    vmapped over the batch (tested)."""
    I1, I2, Ic = init
    packed, B, T, d, Bp = _prep_chain(pairs, nodes, block_b)
    filter_prim, _, _, _ = _prims(d, interpret,
                               _resolve_unroll(interpret, unroll))

    J0 = _pack((-2.0 * (I1[None] + packed["N1_0"]))[:, None], d * d)[0]
    h0 = _pack((I2[None] + packed["N2_0"])[:, None], d)[0]
    Jf_tail, hf_tail, ln = filter_prim(
        J0, h0, packed["P1f"], packed["P2f"], packed["P3f"], packed["Pcf"],
        packed["N1f"], packed["N2f"])

    Jf0 = jnp.moveaxis(J0, -1, 0).reshape(Bp, 1, d, d)
    hf0 = jnp.moveaxis(h0, -1, 0)[:, None]
    Jf = jnp.concatenate([Jf0, _unpack(Jf_tail, (d, d))], axis=1)[:B]
    hf = jnp.concatenate([hf0, _unpack(hf_tail, (d,))], axis=1)[:B]

    from svae_tpu.utils.psd import mvn_logZ_info

    logZ = ln[0, :B] + Ic + mvn_logZ_info(Jf[:, -1], hf[:, -1])
    return logZ, Jf, hf


def lds_backward(pairs, nodes, block_b=128, interpret=False,
                 unroll=None):
    """Backward information filter (beta messages), differentiable:
    (Jb (B,T,d,d), hb (B,T,d)) with zero entries at t = T-1."""
    packed, B, T, d, Bp = _prep_chain(pairs, nodes, block_b)
    _, backward_prim, _, _ = _prims(d, interpret,
                                 _resolve_unroll(interpret, unroll))
    Jb_body, hb_body = backward_prim(
        packed["P1f"], packed["P2f"], packed["P3f"], packed["N1f"],
        packed["N2f"])
    zJ = jnp.zeros((B, 1, d, d), Jb_body.dtype)
    zh = jnp.zeros((B, 1, d), hb_body.dtype)
    Jb = jnp.concatenate([_unpack(Jb_body, (d, d))[:B], zJ], axis=1)
    hb = jnp.concatenate([_unpack(hb_body, (d,))[:B], zh], axis=1)
    return Jb, hb


def fb_pass(init, pairs, nodes, block_b=128, interpret=False,
            unroll=None, fused_adj=False, bidir=None):
    """ONE fused kernel pass computing BOTH information filters:
    returns (logZ (B,), Jf, hf, Jb, hb) -- the union of ``lds_filter``
    and ``lds_backward`` outputs at half the kernel passes (the two
    recursions are independent; see ``_fb_fwd_kernel``). Differentiable
    via the fused adjoint kernel.

    ``bidir=None`` (default) routes to the bidirectional lane-packed
    layout (svae_tpu/ops/pallas_bidir.py -- backward recursion on the
    lanes this kernel would leave idle, ONE chain step per grid step)
    whenever that layout needs strictly fewer 128-lane blocks, i.e.
    B mod ``block_b`` in [1, block_b/2] -- notably the B<=64 serving
    shapes and the SLDS mean-field sweeps. ``True``/``False`` force."""
    B_ = nodes[1].shape[0]
    if bidir is None:
        # an explicit fused_adj request must reach the interleaved
        # kernels (the bidir layout has its own unified adjoint and
        # would silently ignore it)
        bidir = (not fused_adj
                 and -(-2 * B_ // block_b) < 2 * (-(-B_ // block_b)))
    if bidir:
        if fused_adj:
            raise ValueError(
                "fused_adj=True is an interleaved-layout option; it "
                "cannot combine with bidir=True")
        from svae_tpu.ops import pallas_bidir
        return pallas_bidir.fb_pass(init, pairs, nodes, block_b=block_b,
                                    interpret=interpret, unroll=unroll)
    I1, I2, Ic = init
    packed, B, T, d, Bp = _prep_chain(pairs, nodes, block_b)
    _, _, _, fb_prim = _prims(d, interpret,
                              _resolve_unroll(interpret, unroll),
                              fused_adj=fused_adj)

    J0 = _pack((-2.0 * (I1[None] + packed["N1_0"]))[:, None], d * d)[0]
    h0 = _pack((I2[None] + packed["N2_0"])[:, None], d)[0]
    Jf_tail, hf_tail, ln, Jb_body, hb_body = fb_prim(
        J0, h0, packed["P1f"], packed["P2f"], packed["P3f"], packed["Pcf"],
        packed["N1f"], packed["N2f"])

    Jf0 = jnp.moveaxis(J0, -1, 0).reshape(Bp, 1, d, d)
    hf0 = jnp.moveaxis(h0, -1, 0)[:, None]
    Jf = jnp.concatenate([Jf0, _unpack(Jf_tail, (d, d))], axis=1)[:B]
    hf = jnp.concatenate([hf0, _unpack(hf_tail, (d,))], axis=1)[:B]
    zJ = jnp.zeros((B, 1, d, d), Jb_body.dtype)
    zh = jnp.zeros((B, 1, d), hb_body.dtype)
    Jb = jnp.concatenate([_unpack(Jb_body, (d, d))[:B], zJ], axis=1)
    hb = jnp.concatenate([_unpack(hb_body, (d,))[:B], zh], axis=1)

    from svae_tpu.utils.psd import mvn_logZ_info

    logZ = ln[0, :B] + Ic + mvn_logZ_info(Jf[:, -1], hf[:, -1])
    return logZ, Jf, hf, Jb, hb


def _smoother_assembly(pairs, nodes, Jf, hf, Jb, hb):
    """Node/pair smoothed moments from the two filters -- batched XLA on
    custom-VJP'd unrolled linalg (same math as kalman._smoother_core)."""
    from svae_tpu.utils import smallchol
    from svae_tpu.utils.psd import symmetrize

    P1, P2, P3, _ = pairs
    N1, N2 = nodes
    if P1.ndim == 3:
        P1 = P1[None]
        P2 = P2[None]
        P3 = P3[None]

    Js = Jf + Jb
    hs = hf + hb
    L = smallchol.chol(symmetrize(Js))
    Ex = smallchol.cho_solve(L, hs)
    eye = jnp.broadcast_to(jnp.eye(Js.shape[-1], dtype=Js.dtype), Js.shape)
    Sig = smallchol.cho_solve_mat(L, eye)
    ExxT = symmetrize(Sig + Ex[..., :, None] * Ex[..., None, :])

    J12l = -jnp.swapaxes(P2, -1, -2)
    J11 = -2.0 * P3 + Jf[:, :-1]
    J22 = -2.0 * (P1 + N1[:, 1:]) + Jb[:, 1:]
    L11 = smallchol.chol(symmetrize(J11))
    J11inv_J12 = smallchol.cho_solve_mat(
        L11, jnp.broadcast_to(J12l, J11.shape))
    S = J22 - jnp.swapaxes(J12l, -1, -2) @ J11inv_J12
    LS = smallchol.chol(symmetrize(S))
    eyeS = jnp.broadcast_to(jnp.eye(S.shape[-1], dtype=S.dtype), S.shape)
    Sinv = smallchol.cho_solve_mat(LS, eyeS)
    Cov12 = -J11inv_J12 @ Sinv
    Exnxt = Cov12 + Ex[:, :-1, :, None] * Ex[:, 1:, None, :]
    return Ex, ExxT, Exnxt


def lds_smoother(init, pairs, nodes, block_b=128, interpret=False,
                 filtered=None, unroll=None):
    """Differentiable smoother: (logZ, Ex, ExxT, Exnxt), batch leading.
    Pass ``filtered=(logZ, Jf, hf)`` to reuse a filter pass (the
    backward filter then runs standalone); otherwise both filters ride
    ONE fused kernel pass (``fb_pass``)."""
    if filtered is None:
        logZ, Jf, hf, Jb, hb = fb_pass(init, pairs, nodes,
                                       block_b=block_b,
                                       interpret=interpret, unroll=unroll)
    else:
        logZ, Jf, hf = filtered
        Jb, hb = lds_backward(pairs, nodes, block_b=block_b,
                              interpret=interpret, unroll=unroll)
    Ex, ExxT, Exnxt = _smoother_assembly(pairs, nodes, Jf, hf, Jb, hb)
    return logZ, Ex, ExxT, Exnxt


def lds_sample(init, pairs, nodes, key, num_samples, block_b=128,
               interpret=False, filtered=None, eps=None, unroll=None):
    """Differentiable posterior sampler: (S, B, T, d) reparameterized
    draws. ``eps`` overrides the noise (tests)."""
    P1, P2, P3, Pc = pairs
    N1, N2 = nodes
    B, T, d = N2.shape
    dt = N2.dtype
    S = int(num_samples)

    if filtered is None:
        _, Jf, hf = lds_filter(init, pairs, nodes, block_b=block_b,
                               interpret=interpret, unroll=unroll)
    else:
        Jf, hf = filtered

    if eps is None:
        eps = jax.random.normal(key, (S, B, T, d), dt)
    else:
        eps = jnp.asarray(eps, dt)

    # terminal sample (differentiable XLA glue)
    from svae_tpu.utils import smallchol
    from svae_tpu.utils.psd import symmetrize

    LT = smallchol.chol(symmetrize(Jf[:, -1]))
    muT = smallchol.cho_solve(LT, hf[:, -1])
    zT = smallchol.solve_upper_from_lower(LT[None], eps[:, :, -1])
    xT = muT[None] + zT  # (S, B, d)

    # broadcast everything over particles; pack (S*B [+pad]) onto lanes
    if P2.ndim == 3:
        P2b = jnp.broadcast_to(P2[None, None], (S, B) + P2.shape)
        P3b = jnp.broadcast_to(P3[None, None], (S, B) + P3.shape)
    else:
        P2b = jnp.broadcast_to(P2[None], (S,) + P2.shape)
        P3b = jnp.broadcast_to(P3[None], (S,) + P3.shape)
    Jfb = jnp.broadcast_to(Jf[None, :, :-1], (S, B, T - 1, d, d))
    hfb = jnp.broadcast_to(hf[None, :, :-1], (S, B, T - 1, d))
    epsb = eps[:, :, :-1]

    SB = S * B
    pad = (-SB) % block_b
    SBp = SB + pad
    eye = jnp.eye(d, dtype=dt)

    def prep(x, m, fill):
        x = x.reshape((SB,) + x.shape[2:])
        x = _pad_batch(x, pad, fill)
        return _pack(x, m)

    P2f = prep(P2b, d * d, jnp.zeros((), dt))
    P3f = prep(P3b, d * d, -0.5 * eye)
    Jft = prep(Jfb, d * d, eye)
    hft = prep(hfb, d, jnp.zeros((), dt))
    epsf = prep(epsb, d, jnp.zeros((), dt))
    xTf = _pack(_pad_batch(xT.reshape(SB, 1, d), pad,
                           jnp.zeros((), dt)), d)[0]

    _, _, sampler_prim, _ = _prims(d, interpret,
                                _resolve_unroll(interpret, unroll))
    xb = sampler_prim(P2f, P3f, Jft, hft, epsf, xTf)
    x_body = _unpack(xb, (d,))[:SB].reshape(S, B, T - 1, d)
    return jnp.concatenate([x_body, xT[:, :, None]], axis=2)


def lds_estep(init, pairs, nodes, key, num_samples, block_b=128,
              interpret=False, unroll=None):
    """Fully differentiable fused E-step on the Pallas kernels: ONE
    fused forward+backward filter pass (shared by the smoother assembly
    and, via the forward messages, the backward sampler) + one sampler
    pass -- two kernel passes forward, two fused adjoint passes backward.

    Returns ``(samples (S,B,T,d), (Ex, ExxT, Exnxt), logZ (B,))`` --
    the batch-level contract of ``kalman.lds_inference`` (vmapped), with
    forward and backward passes riding the fused kernels."""
    logZ, Jf, hf, Jb, hb = fb_pass(init, pairs, nodes, block_b=block_b,
                                   interpret=interpret, unroll=unroll)
    Ex, ExxT, Exnxt = _smoother_assembly(pairs, nodes, Jf, hf, Jb, hb)
    samples = lds_sample(init, pairs, nodes, key, num_samples,
                         block_b=block_b, interpret=interpret,
                         filtered=(Jf, hf), unroll=unroll)
    return samples, (Ex, ExxT, Exnxt), logZ
