"""Chunked (parallel-in-time) differentiable Pallas E-step.

Breaks the T-long sequential dependency chain that bounds the fused
kernels of svae_tpu/ops/pallas_vjp.py (measured latency-bound at ~7us per
time step against a ~0.3us issue floor -- docs/DESIGN.md "Speed of
light"): the T-1 Gaussian chain-element leaves (svae_tpu/ops/kalman.py
algebra) are split into C chunks ridden IN PARALLEL on the kernel lane
axis, so the grid has only L = ceil((T-1)/C) steps:

  pass 1   ONE Pallas element prefix-scan over (batch x chunk) lanes,
           depth L -- all within-chunk prefixes;
           suffix flavor = the SAME kernel on time-flipped, element-
           reversed rows (rev(e) swaps (J11<->J22, h1<->h2, J12->J12^T));
  pass 2   chunk-boundary reduction = the SAME kernel again at (C, batch)
           layout, depth C;
  pass 3   one batched seeding combine (XLA, depth 1) + the moment
           assembly shared with every other scan flavor
           (kalman.assemble_moments).

Differentiability: the element scan is a ``jax.custom_vjp`` primitive
whose adjoint is a hand-derived reverse-sweep Pallas kernel (the VJP of
``kalman.combine`` in closed form -- derivation in ``_combine_vjp_rows``;
verified against ``jax.vjp(kalman.combine)`` to machine precision).
Passes 2 reuses the same primitive; pass 3 and the sampler's affine
suffix composition are differentiable XLA.

Indivisible lengths need no masking: the chain is extended with
DECOUPLED PAD STEPS -- pad leaf (J11=0, J12=0, J22=I, h=0,
c=-d/2 log 2pi) appends an independent unit-Gaussian time step whose
marginalization contributes exactly zero to the running log-constant, so
logZ, messages, and moments of the real steps are EXACT for any (T, C)
(a Gaussian-specific identity-extension unavailable to the generic
masked-scan flavor in kalman._chunked_scan). Lane padding uses the same
pad element.

(reference scope: upstream svae's Cython kernels --
svae/lds/cython_lds_inference.pyx -- are strictly O(T) sequential; the
parallel-in-time formulation follows arXiv:1905.13002.)

STATUS -- measured and NOT promoted to production (kept as the tested
chunks-on-lanes deployment of temporal parallelization). On-chip
(v5e, f32, d=10, 2026-08-17):

  T=100, B=64:  E-step 11.5 ms vs 3.6 ms for the sequential fused
                kernels (pallas_vjp) -- 0.31x;
  T=1024, B=8:  smoother fwd 52.0 ms / grad 44.9 ms vs pallas_vjp's
                8.6 / 18.6 ms and the XLA chunked scan's 15.9 / 16.4 ms.

Why it loses: the generic 6-output chain-element combine costs ~4x the
specialized filter/backward steps, every element pass pays full-element
DMA + pack/unpack transposes (leaf build alone ~3.5 ms at the bench
shape), and three primitive invocations re-stream what the fused kernels
keep in VMEM. The sequential kernels' per-step latency is low enough
(~2.8 us at T=1024, amortized further by ``unroll``) that breaking the
T-chain does not pay at any measured size; see docs/DESIGN.md
"Parallel-in-time".
"""

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svae_tpu.ops import kalman
from svae_tpu.ops import rowalg as ra
from svae_tpu.utils.psd import f32_linalg

LOG2PI = 1.8378770664093453


# ==========================================================================
# row-packed element helpers
# ==========================================================================


def _nrows(d):
    return 3 * d * d + 2 * d + 1


def _split(arr, d):
    """(R, N) array -> element of row lists (J11, J12, J22, h1, h2, c)."""
    dd = d * d
    o = 0
    J11 = [arr[o + k] for k in range(dd)]
    o += dd
    J12 = [arr[o + k] for k in range(dd)]
    o += dd
    J22 = [arr[o + k] for k in range(dd)]
    o += dd
    h1 = [arr[o + k] for k in range(d)]
    o += d
    h2 = [arr[o + k] for k in range(d)]
    o += d
    c = arr[o]
    return (J11, J12, J22, h1, h2, c)


def _stack(e):
    J11, J12, J22, h1, h2, c = e
    return jnp.stack(J11 + J12 + J22 + h1 + h2 + [c], axis=0)


def _combine_rows(ea, eb, d):
    """kalman.combine on the row-packed layout (see that docstring)."""
    J11a, J12a, J22a, h1a, h2a, ca = ea
    J11b, J12b, J22b, h1b, h2b, cb = eb
    M = ra.add(J22a, J11b)
    Lm = ra.chol(M, d)
    b0 = [x + y for x, y in zip(h2a, h1b)]
    w = ra.solve_lower(Lm, b0, d)
    v = ra.solve_upper(Lm, w, d)                       # M^{-1} b0
    X = ra.solve_upper_mat(Lm, ra.solve_lower_mat(
        Lm, ra.transpose(J12a, d), d), d)              # M^{-1} J12a^T
    Y = ra.solve_upper_mat(Lm, ra.solve_lower_mat(Lm, J12b, d), d)
    J11 = ra.sym(ra.sub(J11a, ra.matmul(J12a, X, d)), d)
    J12 = ra.scale(ra.matmul(J12a, Y, d), -1.0)
    J22 = ra.sym(ra.sub(J22b, ra.matmul_TN(J12b, Y, d)), d)
    h1 = [x - y for x, y in zip(h1a, ra.matvec(J12a, v, d))]
    h2 = [x - y for x, y in zip(h2b, ra.matvec_T(J12b, v, d))]
    c = (ca + cb + 0.5 * d * LOG2PI - 0.5 * ra.logdet_from_chol(Lm, d)
         + 0.5 * ra.dot(w, w))
    return (J11, J12, J22, h1, h2, c)


def _combine_vjp_rows(ea, eb, g, d):
    """Closed-form VJP of ``_combine_rows`` w.r.t. both operands.

    With M = J22a + J11b, b0 = h2a + h1b, X = M^{-1}J12a^T, Y = M^{-1}J12b,
    v = M^{-1}b0 and incoming cotangents (G11, G12, G22, g1, g2, gc)
    (G11/G22 symmetrized -- the forward symmetrizes those outputs):

      dv   = -J12a^T g1 - J12b g2          u  = M^{-1} dv
      db0  = gc v + u
      dM   = sym( X G11 X^T + Y G12^T X^T + Y G22 Y^T
                  - gc/2 (M^{-1} + v v^T) - u v^T )
      dJ12a = -2 G11 X^T - G12 Y^T - g1 v^T
      dJ12b = -X G12 - 2 Y G22 - v g2^T
      d(ea) = (G11, dJ12a, dM, g1, db0, gc)
      d(eb) = (dM, dJ12b, G22, db0, g2, gc)

    Verified against jax.vjp(kalman.combine) to ~1e-15 relative (f64).
    """
    J11a, J12a, J22a, h1a, h2a, ca = ea
    J11b, J12b, J22b, h1b, h2b, cb = eb
    G11, G12, G22, g1, g2, gc = g
    G11 = ra.sym(G11, d)
    G22 = ra.sym(G22, d)

    M = ra.add(J22a, J11b)
    Lm = ra.chol(M, d)
    b0 = [x + y for x, y in zip(h2a, h1b)]
    v = ra.cho_solve(Lm, b0, d)
    X = ra.solve_upper_mat(Lm, ra.solve_lower_mat(
        Lm, ra.transpose(J12a, d), d), d)
    Y = ra.solve_upper_mat(Lm, ra.solve_lower_mat(Lm, J12b, d), d)
    Minv = ra.cho_inverse(Lm, d)

    dv = [-(x + y) for x, y in zip(ra.matvec_T(J12a, g1, d),
                                   ra.matvec(J12b, g2, d))]
    u = ra.cho_solve(Lm, dv, d)
    db0 = [gc * vi + ui for vi, ui in zip(v, u)]

    t1 = ra.matmul_NT(ra.matmul(X, G11, d), X, d)
    t2 = ra.matmul_NT(ra.matmul_NT(Y, G12, d), X, d)
    t3 = ra.matmul_NT(ra.matmul(Y, G22, d), Y, d)
    t4 = ra.scale(ra.add(Minv, ra.outer(v, v, d)), -0.5 * gc)
    t5 = ra.scale(ra.outer(u, v, d), -1.0)
    dM = ra.sym(ra.add(ra.add(ra.add(t1, t2), ra.add(t3, t4)), t5), d)

    dJ12a = ra.sub(
        ra.sub(ra.scale(ra.matmul_NT(G11, X, d), -2.0),
               ra.matmul_NT(G12, Y, d)),
        ra.outer(g1, v, d))
    dJ12b = ra.sub(
        ra.sub(ra.scale(ra.matmul(X, G12, d), -1.0),
               ra.scale(ra.matmul(Y, G22, d), 2.0)),
        ra.outer(v, g2, d))

    dea = (G11, dJ12a, dM, g1, db0, gc)
    deb = (dM, dJ12b, G22, db0, g2, gc)
    return dea, deb


# ==========================================================================
# kernels
# ==========================================================================


def _scan_fwd_kernel(leaves, out, carry, *, d):
    j = pl.program_id(1)  # grid = (lane_tiles, L); lanes are independent

    @pl.when(j == 0)
    def _():
        carry[:] = leaves[0]

    @pl.when(j > 0)
    def _():
        ea = _split(carry[:], d)
        eb = _split(leaves[0], d)
        carry[:] = _stack(_combine_rows(ea, eb, d))

    out[0] = carry[:]


def _scan_adj_kernel(leaves, prefprev, douts, dleaves, dcarry, *, d, L):
    s = pl.program_id(1)  # j = L - 1 - s (reverse sweep via index maps)

    @pl.when(s == 0)
    def _():
        dcarry[:] = jnp.zeros_like(dcarry)

    dc = dcarry[:] + douts[0]

    @pl.when(s < L - 1)  # j > 0: VJP of combine(prefix[j-1], leaf_j)
    def _():
        ea = _split(prefprev[0], d)
        eb = _split(leaves[0], d)
        dA, dB = _combine_vjp_rows(ea, eb, _split(dc, d), d)
        dleaves[0] = _stack(dB)
        dcarry[:] = _stack(dA)

    @pl.when(s == L - 1)  # j == 0: carry_0 = leaf_0
    def _():
        dleaves[0] = dc


LANE_TILE = 128  # one vreg of lanes per block; grid dim 0 walks lane tiles

# XLA:TPU may place whole custom-call operands in VMEM (layout S(1)) when
# each fits individually; at (L, R, lanes) = (13, 321, 512) f32 the three
# adjoint operands stack to 24.66M against the default 16M scoped-vmem
# limit (observed AOT OOM). Raise the per-kernel limit well clear of that.
_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _blk(m, rev=None):
    # index maps must stay affine in the grid ids -- non-affine maps (e.g.
    # clamping with maximum) defeat Mosaic's windowed HBM->VMEM streaming
    # and force whole operands into VMEM.
    if rev is None:
        return pl.BlockSpec((1, m, LANE_TILE), lambda l, s: (s, 0, l),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((1, m, LANE_TILE), lambda l, s: (rev - s, 0, l),
                        memory_space=pltpu.VMEM)


def _scan_fwd_call(leavesf, *, d, interpret):
    L, R, Np = leavesf.shape
    dt = leavesf.dtype
    return pl.pallas_call(
        functools.partial(_scan_fwd_kernel, d=d),
        grid=(Np // LANE_TILE, L),
        in_specs=[_blk(R)],
        out_specs=_blk(R),
        out_shape=jax.ShapeDtypeStruct((L, R, Np), dt),
        scratch_shapes=[pltpu.VMEM((R, LANE_TILE), dt)],
        compiler_params=_PARAMS,
        interpret=interpret,
    )(leavesf)


def _scan_adj_call(leavesf, pref, douts, *, d, interpret):
    L, R, Np = leavesf.shape
    dt = leavesf.dtype
    r = L - 1
    # row j of prefm1 holds prefix[j-1] (row 0 is unused -- the j == 0
    # branch of the kernel never reads it); shifting here keeps the kernel
    # index maps affine (see _blk).
    prefm1 = jnp.concatenate([pref[:1], pref[:-1]], axis=0)
    return pl.pallas_call(
        functools.partial(_scan_adj_kernel, d=d, L=L),
        grid=(Np // LANE_TILE, L),
        in_specs=[_blk(R, rev=r), _blk(R, rev=r),
                  _blk(R, rev=r)],
        out_specs=_blk(R, rev=r),
        out_shape=jax.ShapeDtypeStruct((L, R, Np), dt),
        scratch_shapes=[pltpu.VMEM((R, LANE_TILE), dt)],
        compiler_params=_PARAMS,
        interpret=interpret,
    )(leavesf, prefm1, douts)


@functools.lru_cache(maxsize=None)
def _get_prim(d, interpret):
    @jax.custom_vjp
    def elem_scan(leavesf):
        return _scan_fwd_call(leavesf, d=d, interpret=interpret)

    def fwd(leavesf):
        out = _scan_fwd_call(leavesf, d=d, interpret=interpret)
        return out, (leavesf, out)

    def bwd(res, douts):
        leavesf, pref = res
        dleaves = _scan_adj_call(leavesf, pref, douts, d=d,
                                 interpret=interpret)
        return (dleaves,)

    elem_scan.defvjp(fwd, bwd)
    return elem_scan


# ==========================================================================
# packing (XLA glue)
# ==========================================================================


def _pad_leaf(d, dt):
    """Decoupled unit-Gaussian pad step; its marginalization contributes
    exactly zero to the running constant (module docstring)."""
    z = jnp.zeros((d, d), dt)
    return (z, z, jnp.eye(d, dtype=dt), jnp.zeros((d,), dt),
            jnp.zeros((d,), dt), jnp.asarray(-0.5 * d * LOG2PI, dt))


def _pack(tree, L, lanes_pad, d):
    """Element tree with leading axes (N, L, ...) -> (L, R, N + lanes_pad),
    lane pads filled with the pad leaf."""
    def one(a, fill):
        m = 1
        for s in a.shape[2:]:
            m *= s
        N = a.shape[0]
        a = a.reshape(N, L, m)
        a = jnp.moveaxis(a, 0, -1)  # (L, m, N)
        if lanes_pad:
            f = jnp.broadcast_to(
                jnp.reshape(fill, (1, m, 1)), (L, m, lanes_pad))
            a = jnp.concatenate([a, f], axis=-1)
        return a

    pad = _pad_leaf(d, jax.tree.leaves(tree)[0].dtype)
    parts = [one(a, f) for a, f in zip(tree, pad)]
    return jnp.concatenate(parts, axis=1)


def _unpack(arr, N, d, shapes):
    """(L, R, Np) -> element tree with leading axes (N, L, ...)."""
    L = arr.shape[0]
    out = []
    o = 0
    for tail in shapes:
        m = 1
        for s in tail:
            m *= s
        a = arr[:, o:o + m, :N]
        o += m
        a = jnp.moveaxis(a, -1, 0).reshape((N, L) + tail)
        out.append(a)
    return tuple(out)


def _elem_shapes(d):
    return [(d, d), (d, d), (d, d), (d,), (d,), ()]


def _rev_elem(e):
    J11, J12, J22, h1, h2, c = e
    return (J22, jnp.swapaxes(J12, -1, -2), J11, h2, h1, c)


# ==========================================================================
# chunked scans + E-step entry points
# ==========================================================================


def _chunk_scans(leaves, C, d, interpret, block_lanes=128):
    """All-prefix/suffix element trees plus the total element for a batch
    of chains. ``leaves``: element tree with leading axes (B, T1, ...).
    Returns ``(total, prefix, suffix)`` with leading axes (B,), (B, T1)."""
    B, T1 = jax.tree.leaves(leaves)[0].shape[:2]
    dt = jax.tree.leaves(leaves)[0].dtype
    C = max(1, min(int(C), T1))
    L = -(-T1 // C)
    npad = C * L - T1
    if npad:
        padl = _pad_leaf(d, dt)
        leaves = tuple(
            jnp.concatenate([a, jnp.broadcast_to(
                p, (B, npad) + a.shape[2:]).astype(dt)], axis=1)
            for a, p in zip(leaves, padl))

    # fold chunks onto the batch axis: (B, C*L, ...) -> (B*C, L, ...)
    fold = tuple(a.reshape((B * C, L) + a.shape[2:]) for a in leaves)
    lanes_pad = (-(B * C)) % block_lanes
    prim = _get_prim(d, bool(interpret))
    shapes = _elem_shapes(d)

    pref_f = _unpack(prim(_pack(fold, L, lanes_pad, d)), B * C, d, shapes)

    flip = tuple(jnp.flip(a, axis=1) for a in _rev_elem(fold))
    suff_r = _unpack(prim(_pack(flip, L, lanes_pad, d)), B * C, d, shapes)
    suff_f = _rev_elem(tuple(jnp.flip(a, axis=1) for a in suff_r))

    # chunk-boundary reduction: the SAME primitive with chunk on the grid
    # axis and batch on lanes -- _pack wants leading (N=B, L=C, ...)
    redt = tuple(a.reshape((B, C, L) + a.shape[2:])[:, :, -1]
                 for a in pref_f)  # chunk totals, (B, C, ...)
    lanes_pad_b = (-B) % block_lanes
    Pincl = _unpack(prim(_pack(redt, C, lanes_pad_b, d)), B, d, shapes)

    flip_r = tuple(jnp.flip(a, axis=1) for a in _rev_elem(redt))
    Sincl_r = _unpack(prim(_pack(flip_r, C, lanes_pad_b, d)), B, d, shapes)
    Sincl = _rev_elem(tuple(jnp.flip(a, axis=1) for a in Sincl_r))

    total = tuple(a[:, -1] for a in Pincl)

    # seed chunks with the global prefix/suffix (ONE batched combine each)
    pref_c = tuple(a.reshape((B, C, L) + a.shape[2:]) for a in pref_f)
    suff_c = tuple(a.reshape((B, C, L) + a.shape[2:]) for a in suff_f)
    if C > 1:
        Pprev = tuple(jnp.broadcast_to(
            a[:, :-1, None], (B, C - 1, L) + a.shape[2:]) for a in Pincl)
        seeded_p = kalman.combine(Pprev, tuple(a[:, 1:] for a in pref_c))
        gpref = tuple(jnp.concatenate([a[:, :1], s], axis=1)
                      for a, s in zip(pref_c, seeded_p))
        Snext = tuple(jnp.broadcast_to(
            a[:, 1:, None], (B, C - 1, L) + a.shape[2:]) for a in Sincl)
        seeded_s = kalman.combine(tuple(a[:, :-1] for a in suff_c), Snext)
        gsuff = tuple(jnp.concatenate([s, a[:, -1:]], axis=1)
                      for a, s in zip(suff_c, seeded_s))
    else:
        gpref, gsuff = pref_c, suff_c

    prefix = tuple(a.reshape((B, C * L) + a.shape[3:])[:, :T1]
                   for a in gpref)
    suffix = tuple(a.reshape((B, C * L) + a.shape[3:])[:, :T1]
                   for a in gsuff)
    return total, prefix, suffix


@f32_linalg
def lds_smoother(init, pairs, nodes, chunks=8, interpret=False):
    """Chunked-Pallas smoother: (logZ (B,), Ex, ExxT, Exnxt), batch
    leading. Shared pairs; same outputs as pallas_vjp.lds_smoother."""
    logZ, Ex, ExxT, Exnxt, _, _ = _smoother_core(init, pairs, nodes,
                                                 chunks, interpret)
    return logZ, Ex, ExxT, Exnxt


def _smoother_core(init, pairs, nodes, chunks, interpret):
    N1, N2 = nodes
    B, T, d = N2.shape
    leaves = jax.vmap(
        lambda n1, n2: kalman.build_leaves(init, pairs, (n1, n2))
    )(N1, N2)
    total, prefix, suffix = _chunk_scans(leaves, chunks, d, interpret)
    return jax.vmap(
        lambda n1, n2, tot, pre, suf: kalman.assemble_moments(
            init, pairs, (n1, n2), tot, pre, suf)
    )(N1, N2, total, prefix, suffix)


@f32_linalg
def lds_estep(init, pairs, nodes, key, num_samples, chunks=8,
              interpret=False):
    """Chunked-Pallas fused E-step; contract of pallas_vjp.lds_estep:
    ``(samples (S,B,T,d), (Ex, ExxT, Exnxt), logZ (B,))``. The sampler's
    affine suffix composition rides the (cheap) XLA chunked scan."""
    N1, N2 = nodes
    B = N2.shape[0]
    logZ, Ex, ExxT, Exnxt, Jf, hf = _smoother_core(init, pairs, nodes,
                                                   chunks, interpret)
    keys = jax.random.split(key, B)
    samples = jax.vmap(
        lambda n1, n2, jf, hfv, k: kalman.lds_sample(
            init, pairs, (n1, n2), k, num_samples, parallel=int(chunks),
            filtered=(jf, hfv))
    )(N1, N2, Jf, hf, keys)  # (B, S, T, d)
    samples = jnp.moveaxis(samples, 0, 1)
    return samples, (Ex, ExxT, Exnxt), logZ
