"""Chain-shortening A/B (round-4 verdict missing #4 / next-round #5).

The packed E-step's serial floor is the T-1-step information-filter
recursion (~1.5 us per grid step, serialized-math-bound). Pre-combining
ADJACENT chain elements halves the serial depth: two consecutive generic
filter steps

    step(J, h) = (C - D (J+A)^{-1} D^T,  D (J+A)^{-1} (h+f) + e,
                  inc = d/2 log2pi - 1/2 log|J+A| + 1/2 v^T v + pc)

compose EXACTLY into one step of the same form (Woodbury on the middle
marginal; S = C1 + A2, b = e1 + f2):

    A' = A1 - D1^T S^{-1} D1        C' = C2 - D2 S^{-1} D2^T
    D' = D2 S^{-1} D1               f' = f1 + D1^T S^{-1} b
    e' = e2 + D2 S^{-1} b
    pc' = pc1 + pc2 + d/2 log2pi - 1/2 log|S| + 1/2 b^T S^{-1} b

The pre-combine is rowwise-INDEPENDENT, so unlike the serial chain it
pipelines across rows (and so does the odd-position fill-in pass the
smoother needs afterwards). Whether the halved serial depth beats the
extra parallel work + the dense combined streams (the combined elements
are no longer stationary, so the half-length chain must run the generic
dense-stream kernel) is exactly what this script measures:

  t_full        stationary packed filter fwd at T-1 rows (production)
  t_serial_h    generic bidir filter fwd at ceil((T-1)/2) dense rows
  t_pre         rowwise pre-combine kernel over (T-1)/2 pairs
  t_fill        rowwise step-apply kernel over (T-1)/2 rows (fill-in)

Verdict rule: shortened = t_pre + t_serial_h + t_fill (+ glue, measured
as part of each call) vs t_full. Also checks the combine algebra
numerically against two sequential steps. Writes
benchmarks/out/chain_shorten.json.

Usage:  /opt/venv/bin/python benchmarks/bench_chain_shorten.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svae_tpu.ops import rowalg as ra
from svae_tpu.ops.pallas_vjp import (
    LOG2PI, _PARAMS, _blk, _whole, _grid_of, _pad_time, _rows, _store_u)

B, T, D = 64, 100, 10
ITERS = 30


# --------------------------------------------------------------------------
# rowwise kernels (no carry between rows -> pipelines across the grid)
# --------------------------------------------------------------------------


def _precombine_kernel(A1, C1, D1, E1, F1, Pc1, A2, C2, D2, E2, F2, Pc2,
                       Ao, Co, Do, Eo, Fo, Pco, *, d, U):
    dd = d * d
    for u in range(U):
        a1 = _rows(A1[u], dd)
        c1 = _rows(C1[u], dd)
        d1 = _rows(D1[u], dd)
        e1 = _rows(E1[u], d)
        f1 = _rows(F1[u], d)
        a2 = _rows(A2[u], dd)
        c2 = _rows(C2[u], dd)
        d2 = _rows(D2[u], dd)
        e2 = _rows(E2[u], d)
        f2 = _rows(F2[u], d)

        S = ra.add(c1, a2)
        L = ra.chol(S, d)
        SiD1 = ra.solve_upper_mat(L, ra.solve_lower_mat(L, d1, d), d)
        SiD2T = ra.solve_upper_mat(
            L, ra.solve_lower_mat(L, ra.transpose(d2, d), d), d)
        b = ra.add(e1, f2)
        v = ra.solve_lower(L, b, d)
        Sib = ra.solve_upper(L, v, d)

        Ao_u = ra.sub(a1, ra.matmul_TN(d1, SiD1, d))
        Co_u = ra.sub(c2, ra.matmul(d2, SiD2T, d))
        Do_u = ra.matmul(d2, SiD1, d)
        Fo_u = ra.add(f1, ra.matvec_T(d1, Sib, d))
        Eo_u = ra.add(e2, ra.matvec(d2, Sib, d))
        pc = (Pc1[u][0] + Pc2[u][0] + 0.5 * d * LOG2PI
              - 0.5 * ra.logdet_from_chol(L, d) + 0.5 * ra.dot(v, v))

        _store_u(Ao, u, Ao_u)
        _store_u(Co, u, Co_u)
        _store_u(Do, u, Do_u)
        _store_u(Eo, u, Eo_u)
        _store_u(Fo, u, Fo_u)
        Pco[u, 0, :] = pc


def _apply_kernel(Jin, hin, A, C, D, E, F, Pc, Jo, ho, inco, *, d, U):
    """Rowwise (carry-free) application of the generic filter step: each
    row consumes its OWN (Jin, hin) -- the fill-in pass that recovers the
    odd-position messages after the shortened serial sweep."""
    dd = d * d
    for u in range(U):
        J = _rows(Jin[u], dd)
        h = _rows(hin[u], d)
        Au = _rows(A[u], dd)
        Cu = _rows(C[u], dd)
        Du = _rows(D[u], dd)
        eu = _rows(E[u], d)
        fu = _rows(F[u], d)

        M = ra.add(J, Au)
        L = ra.chol(M, d)
        bvec = ra.add(h, fu)
        v = ra.solve_lower(L, bvec, d)
        inc = (0.5 * d * LOG2PI - 0.5 * ra.logdet_from_chol(L, d)
               + 0.5 * ra.dot(v, v) + Pc[u][0])
        w = ra.solve_upper(L, v, d)
        Minv_DT = ra.solve_upper_mat(
            L, ra.solve_lower_mat(L, ra.transpose(Du, d), d), d)
        _store_u(Jo, u, ra.sub(Cu, ra.matmul(Du, Minv_DT, d)))
        _store_u(ho, u, ra.add(ra.matvec(Du, w, d), eu))
        inco[u, 0, :] = inc


def _rowwise_call(kernel, ins, out_specs_shapes, *, d, U, interpret):
    Tn = ins[0].shape[0]
    Bp = ins[0].shape[-1]
    dt = ins[0].dtype
    G, Tp = _grid_of(Tn, U)
    ins = [_pad_time(x, Tp) for x in ins]
    specs = [_blk(U, x.shape[1], Bp) for x in ins]
    out_specs = [_blk(U, m, Bp) for m in out_specs_shapes]
    out_shape = [jax.ShapeDtypeStruct((Tp, m, Bp), dt)
                 for m in out_specs_shapes]
    outs = pl.pallas_call(
        functools.partial(kernel, d=d, U=U),
        grid=(G,),
        in_specs=specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_PARAMS,
        interpret=interpret,
    )(*ins)
    return tuple(x[:Tn] for x in outs)


# --------------------------------------------------------------------------
# harness
# --------------------------------------------------------------------------


def _mk_streams(key, T1, d, Bp, dt=jnp.float32):
    """Random SPD-ish unified streams (A, C, D, E, F, Pc) packed
    (T1, m, Bp), plus an SPD J0/h0."""
    ks = jax.random.split(key, 8)
    dd = d * d

    def spd(k, scale=1.0):
        Q = jax.random.normal(k, (T1, Bp, d, d), dt) * 0.3
        M = jnp.swapaxes(Q, -1, -2) @ Q + scale * jnp.eye(d, dtype=dt)
        return jnp.moveaxis(M.reshape(T1, Bp, dd), 1, -1)

    A = spd(ks[0], 2.0)
    C = spd(ks[1], 2.0)
    Dm = jnp.moveaxis(
        (0.5 * jax.random.normal(ks[2], (T1, Bp, d, d), dt))
        .reshape(T1, Bp, dd), 1, -1)
    E = jnp.moveaxis(jax.random.normal(ks[3], (T1, Bp, d), dt), 1, -1)
    F = jnp.moveaxis(jax.random.normal(ks[4], (T1, Bp, d), dt), 1, -1)
    Pc = jnp.moveaxis(jax.random.normal(ks[5], (T1, Bp, 1), dt) * 0.1,
                      1, -1)
    J0m = jax.random.normal(ks[6], (Bp, d, d), dt) * 0.3
    J0 = jnp.moveaxis(
        (jnp.swapaxes(J0m, -1, -2) @ J0m
         + 2.0 * jnp.eye(d, dtype=dt)).reshape(Bp, dd), 0, -1)
    h0 = jax.random.normal(ks[7], (d, Bp), dt)
    return (A, C, Dm, E, F, Pc), J0, h0


def _combine_xla(el1, el2, d):
    """f64 NumPy reference of the pair-composite element (docstring
    formulas) for the correctness gate."""
    A1, C1, D1, e1, f1, pc1 = el1
    A2, C2, D2, e2, f2, pc2 = el2
    S = C1 + A2
    Si = np.linalg.inv(S)
    b = e1 + f2
    Ap = A1 - D1.T @ Si @ D1
    Cp = C2 - D2 @ Si @ D2.T
    Dp = D2 @ Si @ D1
    fp = f1 + D1.T @ Si @ b
    ep = e2 + D2 @ Si @ b
    pcp = (pc1 + pc2 + 0.5 * d * np.log(2 * np.pi)
           - 0.5 * np.linalg.slogdet(S)[1] + 0.5 * b @ Si @ b)
    return Ap, Cp, Dp, ep, fp, pcp


def _step_np(J, h, ln, el, d):
    A, C, D, e, f, pc = el
    M = J + A
    Mi = np.linalg.inv(M)
    v = h + f
    inc = (0.5 * d * np.log(2 * np.pi) - 0.5 * np.linalg.slogdet(M)[1]
           + 0.5 * v @ Mi @ v + pc)
    return C - D @ Mi @ D.T, D @ Mi @ v + e, ln + inc


def check_combine_algebra():
    """Composite-step identity: step(el2, step(el1, (J,h))) ==
    step(combine(el1, el2), (J,h)) including the lognorm increment."""
    rng = np.random.RandomState(0)
    d = 4

    def spd():
        Q = rng.randn(d, d) * 0.4
        return Q.T @ Q + 2.0 * np.eye(d)

    for trial in range(5):
        el1 = (spd(), spd(), 0.5 * rng.randn(d, d), rng.randn(d),
               rng.randn(d), rng.randn() * 0.1)
        el2 = (spd(), spd(), 0.5 * rng.randn(d, d), rng.randn(d),
               rng.randn(d), rng.randn() * 0.1)
        J, h = spd(), rng.randn(d)
        J1, h1, l1 = _step_np(J, h, 0.0, el1, d)
        J2, h2, l2 = _step_np(J1, h1, l1, el2, d)
        elc = _combine_xla(el1, el2, d)
        Jc, hc, lc = _step_np(J, h, 0.0, elc, d)
        np.testing.assert_allclose(Jc, J2, rtol=1e-10)
        np.testing.assert_allclose(hc, h2, rtol=1e-9)
        np.testing.assert_allclose(lc, l2, rtol=1e-9)
    print("combine algebra: exact (5 random trials, f64)", flush=True)


def _time(fn, args, iters=10, passes=3, k_lo=10, k_hi=60):
    """Per-call device time via the SLOPE method (see
    memory/axon-tunnel-measurement-hazards): time the same jitted
    k-inner-call scan at two k values over chained dispatches, slope =
    (t_hi - t_lo)/(k_hi - k_lo). Cancels the 1.5-5 ms drifting
    per-dispatch tunnel overhead that a one-call-per-dispatch loop
    measures instead of the kernel. The carry perturbs the first operand
    each inner call (no hoisting) and chains across dispatches (no
    dispatch-cache hits)."""

    def make(k):
        @jax.jit
        def run(a, seed):
            def body(acc, _):
                ap = (a[0] + acc * jnp.asarray(1e-30, a[0].dtype),) \
                    + tuple(a[1:])
                out = fn(*ap)
                leaf = jax.tree.leaves(out)[0]
                return acc + jnp.sum(leaf[..., :1]) * 1e-20, None
            acc, _ = jax.lax.scan(body, seed, None, length=k)
            return acc
        return run

    runs = {k: make(k) for k in (k_lo, k_hi)}
    seed = jnp.zeros((), jnp.float32)
    for k in (k_lo, k_hi):
        seed = runs[k](args, seed)
    jax.block_until_ready(seed)
    for k in (k_lo, k_hi):  # chained warmup
        seed = runs[k](args, seed)
    jax.block_until_ready(seed)

    t_at = {k_lo: [], k_hi: []}
    for _ in range(passes):
        for k in (k_lo, k_hi):
            t0 = time.perf_counter()
            s = seed
            for _ in range(iters):
                s = runs[k](args, s)
            jax.block_until_ready(s)
            t_at[k].append((time.perf_counter() - t0) / iters)
    assert np.isfinite(float(s))
    slopes = [(hi - lo) / (k_hi - k_lo)
              for lo, hi in zip(t_at[k_lo], t_at[k_hi])]
    dt = max(slopes)
    return dt, (min(slopes), max(slopes))


def main():
    check_combine_algebra()
    interpret = jax.default_backend() != "tpu"
    d, dd = D, D * D
    Bp = 128
    T1 = T - 1
    Th = (T1 + 1) // 2
    key = jax.random.PRNGKey(0)
    (A, C, Dm, E, F, Pc), J0, h0 = _mk_streams(key, T1, d, Bp)

    report = {"device": str(jax.devices()[0]), "on_tpu": not interpret,
              "shapes": {"B": B, "T": T, "d": D, "Bp": Bp}, "ms": {},
              "spread_ms": {}}

    def rec(name, dt, lohi):
        report["ms"][name] = round(dt * 1e3, 4)
        report["spread_ms"][name] = [round(lohi[0] * 1e3, 4),
                                     round(lohi[1] * 1e3, 4)]
        print(f"{name:14s} {dt * 1e3:8.4f} ms  [{lohi[0] * 1e3:.4f}, "
              f"{lohi[1] * 1e3:.4f}]", flush=True)

    # --- serial generic bidir filter fwd at T1 and ceil(T1/2) rows ---
    from svae_tpu.ops import pallas_bidir

    U = 1 if interpret else 4

    def serial(Ax, Cx, Dx, Ex, Fx, Pcx):
        return pallas_bidir._bidir_fwd_call(
            J0, h0, Ax, Cx, Dx, Ex, Fx, Pcx, d=d, U=U, interpret=interpret)

    serial_j = jax.jit(serial)
    rec("serial_full", *_time(serial_j, (A, C, Dm, E, F, Pc)))
    half = tuple(x[:Th] for x in (A, C, Dm, E, F, Pc))
    rec("serial_half", *_time(serial_j, half))

    # --- rowwise pre-combine over T1//2 pairs ---
    ev = tuple(x[0::2][: T1 // 2] for x in (A, C, Dm, E, F, Pc))
    od = tuple(x[1::2] for x in (A, C, Dm, E, F, Pc))

    def pre(A1, C1, D1, E1, F1, P1, A2, C2, D2, E2, F2, P2):
        return _rowwise_call(
            _precombine_kernel,
            [A1, C1, D1, E1, F1, P1, A2, C2, D2, E2, F2, P2],
            [dd, dd, dd, d, d, 1], d=d, U=U, interpret=interpret)

    pre_j = jax.jit(pre)
    rec("precombine", *_time(pre_j, ev + od))

    # --- rowwise fill-in apply over T1//2 rows ---
    Jin = jnp.broadcast_to(J0[None], (T1 // 2, dd, Bp))
    hin = jnp.broadcast_to(h0[None], (T1 // 2, d, Bp))

    def fill(Jx, hx, Ax, Cx, Dx, Ex, Fx, Pcx):
        return _rowwise_call(
            _apply_kernel, [Jx, hx, Ax, Cx, Dx, Ex, Fx, Pcx],
            [dd, d, 1], d=d, U=U, interpret=interpret)

    fill_j = jax.jit(fill)
    rec("fillin", *_time(fill_j, (Jin, hin) + ev))

    # --- correctness: shortened == full on real chain values ---
    comb = pre_j(*(ev + od))
    tail = tuple(x[T1 // 2 * 2:] for x in (A, C, Dm, E, F, Pc))
    comb_full = tuple(
        jnp.concatenate([c, t], axis=0) for c, t in zip(comb, tail))
    Jr_s, hr_s, ln_s = serial_j(*comb_full)
    Jr_f, hr_f, ln_f = serial_j(A, C, Dm, E, F, Pc)
    err_J = float(jnp.max(jnp.abs(Jr_s[T1 // 2 - 1] - Jr_f[T1 - 1 - (T1 % 2)]
                                  )))
    err_ln = float(jnp.max(jnp.abs(ln_s - ln_f)))
    report["parity"] = {"final_J_maxerr": err_J, "lognorm_maxerr": err_ln}
    print(f"parity: final-J {err_J:.2e}, lognorm {err_ln:.2e}", flush=True)

    t_short = (report["ms"]["precombine"] + report["ms"]["serial_half"]
               + report["ms"]["fillin"])
    report["ms"]["shortened_total"] = round(t_short, 4)
    report["ratio_full_over_shortened"] = round(
        report["ms"]["serial_full"] / t_short, 3)
    print(f"shortened total {t_short:.4f} ms vs full "
          f"{report['ms']['serial_full']:.4f} ms -> ratio "
          f"{report['ratio_full_over_shortened']:.3f}", flush=True)

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "chain_shorten.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
