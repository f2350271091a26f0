"""Time-axis sharding of the Gaussian chain across the device mesh --
the PGM analogue of context/ring parallelism (SURVEY.md section 5
"long-context" row).

The chain's T-1 leaf elements are sharded contiguously over a ``time``
mesh axis. Inference is the blocked two-pass algorithm (the mesh
deployment of ``ops/kalman._chunked_scan``; temporal parallelization per
arXiv:1905.13002):

  pass 1   each device sequentially combines its local leaves
           (depth T/C) keeping all local prefixes/suffixes;
  exchange ONE ``all_gather`` of the C chunk elements over the time axis
           (an element is ~(3 d^2 + 2 d + 1) floats -- the boundary
           messages; this is the only collective);
  reduce   every device reduces the C gathered elements (depth C,
           replicated work);
  pass 2   every device seeds its local scans with its global
           prefix/suffix in ONE batched combine and assembles its local
           smoothed moments.

Layout contract: T = C * L (T divisible by the time-axis size). The T-1
pairs are padded with one leading dummy leaf so leaves and nodes shard
uniformly; device c owns nodes [cL, cL+L) and (padded) leaf rows
[cL, cL+L), where leaf row j corresponds to global pair cL+j-1 (device
0's row 0 is the dummy, masked out of the combines and sliced off the
outputs). Cross-boundary messages (alpha / beta at the chunk edges) come
from the replicated chunk reductions -- no ppermute needed.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

try:  # jax >= 0.4.35
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from svae_tpu.ops import kalman
from svae_tpu.utils import smallchol
from svae_tpu.utils.psd import symmetrize, f32_linalg

# Python float, not jnp: a module-level jnp constant initializes the
# XLA backend at import, which breaks jax.distributed.initialize in
# multi-process programs (it must run before any backend touch).
LOG2PI = 1.8378770664093453


def _tmap(f, *trees):
    return jax.tree.map(f, *trees)


def _masked_combine(state, leaf_and_mask):
    """Prefix-scan step skipping invalid leaves. ``state = (carry,
    started)``: until a valid leaf has been absorbed the carry is garbage
    (the dummy pad row), so the first valid leaf REPLACES it."""
    carry, started = state
    leaf, ok = leaf_and_mask
    combined = kalman.combine(carry, leaf)
    new = _tmap(lambda a, b: jnp.where(started, a, b), combined, leaf)
    out = _tmap(lambda a, b: jnp.where(ok, a, b), new, carry)
    return (out, started | ok), out


def _masked_combine_rev(state, leaf_and_mask):
    carry, started = state
    leaf, ok = leaf_and_mask
    combined = kalman.combine(leaf, carry)
    new = _tmap(lambda a, b: jnp.where(started, a, b), combined, leaf)
    out = _tmap(lambda a, b: jnp.where(ok, a, b), new, carry)
    return (out, started | ok), out


def _scan_keep(step, e0, rest):
    total, tail = jax.lax.scan(step, e0, rest)
    keep = _tmap(lambda f, r: jnp.concatenate([f[None], r], axis=0), e0,
                 tail)
    return total, keep


def _masked_scan_keep(step, e0, valid0, rest, mask_rest):
    (total, _), tail = jax.lax.scan(step, (e0, valid0), (rest, mask_rest))
    keep = _tmap(lambda f, r: jnp.concatenate([f[None], r], axis=0), e0,
                 tail)
    return total, keep


def _reduce_chunks(E_all, reverse=False):
    """Inclusive sequential reduction of the gathered chunk elements
    (replicated, depth C)."""
    e0 = _tmap(lambda a: a[0] if not reverse else a[-1], E_all)
    rest = _tmap(lambda a: (a[1:] if not reverse else jnp.flip(a[:-1], 0)),
                 E_all)

    def fstep(c, e):
        out = kalman.combine(c, e)
        return out, out

    def rstep(c, e):
        out = kalman.combine(e, c)
        return out, out

    total, keep = _scan_keep(rstep if reverse else fstep, e0, rest)
    if reverse:
        keep = _tmap(lambda a: jnp.flip(a, axis=0), keep)
    return total, keep


def _dummy_leaf(d, dt):
    """Benign PD element for the masked dummy slot (its combines are
    discarded by the mask, but must stay finite)."""
    eye = jnp.eye(d, dtype=dt)
    z = jnp.zeros((d,), dt)
    return (eye, 0.0 * eye, eye, z, z, jnp.zeros((), dt))


def build_padded_leaves(init, pairs, nodes):
    """Global (T-1)-leaf chain -> C*L = T rows with a leading dummy row
    (row k corresponds to global leaf k-1)."""
    leaves = kalman.build_leaves(init, pairs, nodes)
    d = nodes[1].shape[-1]
    dummy = _dummy_leaf(d, nodes[1].dtype)
    return _tmap(lambda dm, a: jnp.concatenate(
        [jnp.broadcast_to(dm, (1,) + a.shape[1:]).astype(a.dtype), a],
        axis=0), dummy, leaves)


def _local_smoother(leaves_pad, N1_loc, N2_loc, P3_loc, P2_loc, P1_loc,
                    J0_row, h0_row, *, axis, C, L, d):
    """shard_map body: leaves_pad/nodes/pairs are the device's local rows;
    J0_row/h0_row are the (replicated) init+node0 filtered potential."""
    c = jax.lax.axis_index(axis)
    jrow = jnp.arange(L)
    valid = (c * L + jrow) > 0  # row 0 of device 0 is the dummy

    # ---- pass 1: local masked prefix/suffix scans ----
    e0 = _tmap(lambda a: a[0], leaves_pad)
    rest = _tmap(lambda a: a[1:], leaves_pad)
    E_loc, local_prefix = _masked_scan_keep(
        _masked_combine, e0, valid[0], rest, valid[1:])
    # local_prefix (L, ...): row j = combine of valid rows <= j (row 0 of
    # device 0 is the raw dummy; all its downstream uses are masked)

    eL = _tmap(lambda a: a[-1], leaves_pad)
    restr = _tmap(lambda a: jnp.flip(a[:-1], axis=0), leaves_pad)
    _, suff_keep_r = _masked_scan_keep(
        _masked_combine_rev, eL, valid[-1], restr, jnp.flip(valid[:-1]))
    local_suffix = _tmap(lambda a: jnp.flip(a, axis=0), suff_keep_r)

    # ---- exchange + replicated chunk reductions ----
    E_all = _tmap(lambda a: jax.lax.all_gather(a, axis), E_loc)  # (C, ...)
    total, Pincl = _reduce_chunks(E_all)            # Pincl[k] = E_0..E_k
    _, Sincl = _reduce_chunks(E_all, reverse=True)  # Sincl[k] = E_k..E_末

    # ---- pass 2: seed local scans with the global prefix/suffix ----
    Pprev = _tmap(lambda a: a[jnp.maximum(c - 1, 0)], Pincl)
    seeded_p = kalman.combine(
        _tmap(lambda a: jnp.broadcast_to(a, (L,) + a.shape), Pprev),
        local_prefix)
    g_prefix = _tmap(lambda s, l: jnp.where(c > 0, s, l), seeded_p,
                     local_prefix)
    Snext = _tmap(lambda a: a[jnp.minimum(c + 1, C - 1)], Sincl)
    seeded_s = kalman.combine(
        local_suffix,
        _tmap(lambda a: jnp.broadcast_to(a, (L,) + a.shape), Snext))
    g_suffix = _tmap(lambda s, l: jnp.where(c < C - 1, s, l), seeded_s,
                     local_suffix)

    # ---- filtered alpha at this device's nodes [cL, cL+L) ----
    Jp, hp, cp = kalman.marginalize_first(g_prefix)  # row j -> node cL+j
    # device 0 row 0: alpha_0 = init + node_0 (explicit)
    Jf = jnp.where((c == 0) & (jrow == 0)[:, None, None],
                   J0_row[None], Jp)
    hf = jnp.where((c == 0) & (jrow == 0)[:, None], h0_row[None], hp)

    # ---- beta at nodes [cL, cL+L) ----
    # row j of g_suffix -> beta at node cL+j-1; shift left by one and top
    # up the last node from the replicated chunk suffix Sincl[c+1].
    Jb_raw, hb_raw, _ = kalman.marginalize_last(g_suffix)
    JbS, hbS, _ = kalman.marginalize_last(Snext)
    Jb = jnp.concatenate([Jb_raw[1:], JbS[None]], axis=0)
    hb = jnp.concatenate([hb_raw[1:], hbS[None]], axis=0)
    last_node = (c == C - 1) & (jrow == L - 1)
    Jb = jnp.where(last_node[:, None, None], 0.0, Jb)
    hb = jnp.where(last_node[:, None], 0.0, hb)
    # node 0's "beta" double-counts init+node_0 (leaf 0 owns them): subtract
    first_node = (c == 0) & (jrow == 0)
    Jb = jnp.where(first_node[:, None, None], Jb - Jf, Jb)
    hb = jnp.where(first_node[:, None], hb - hf, hb)

    # ---- node moments ----
    Js = symmetrize(Jf + Jb)
    hs = hf + hb
    Lc = smallchol.chol(Js)
    Ex = smallchol.cho_solve(Lc, hs)
    eye = jnp.broadcast_to(jnp.eye(d, dtype=Js.dtype), Js.shape)
    Sig = smallchol.cho_solve_mat(Lc, eye)
    ExxT = symmetrize(Sig + Ex[..., :, None] * Ex[..., None, :])

    # ---- pair moments for (padded) pair rows: row j -> pair cL+j-1 ----
    # needs alpha at node t = cL+j-1 (shift right; row 0 from Pincl[c-1])
    Ja_prev, ha_prev, _ = kalman.marginalize_first(Pprev)
    Jf_t = jnp.concatenate([Ja_prev[None], Jf[:-1]], axis=0)
    hf_t = jnp.concatenate([ha_prev[None], hf[:-1]], axis=0)
    # device 0 row 0 is dummy; rows are masked at the end
    J11 = -2.0 * P3_loc + Jf_t
    J12l = -jnp.swapaxes(P2_loc, -1, -2)
    J22 = -2.0 * (P1_loc + N1_loc) + Jb
    L11 = smallchol.chol(symmetrize(J11))
    J11inv_J12 = smallchol.cho_solve_mat(L11, jnp.broadcast_to(
        J12l, J11.shape))
    S = J22 - jnp.swapaxes(J12l, -1, -2) @ J11inv_J12
    LS = smallchol.chol(symmetrize(S))
    eyeS = jnp.broadcast_to(jnp.eye(d, dtype=S.dtype), S.shape)
    Sinv = smallchol.cho_solve_mat(LS, eyeS)
    Cov12 = -J11inv_J12 @ Sinv
    # Ex at node t: row 0 needs the PREVIOUS device's last Ex -- recompute
    # it from the replicated boundary messages instead of a ppermute:
    # alpha_{cL-1} + beta_{cL-1}; beta_{cL-1} = marg_last(Sincl[c]).
    JbP, hbP, _ = kalman.marginalize_last(
        _tmap(lambda a: a[jnp.minimum(c, C - 1)], Sincl))
    JsP = symmetrize(Ja_prev + JbP)
    LcP = smallchol.chol(JsP)
    ExP = smallchol.cho_solve(LcP, ha_prev + hbP)
    Ex_t = jnp.concatenate([ExP[None], Ex[:-1]], axis=0)
    Exnxt = Cov12 + Ex_t[:, :, None] * Ex[:, None, :]
    Exnxt = jnp.where(valid[:, None, None], Exnxt, 0.0)

    # ---- logZ (replicated) ----
    logZ = kalman._gauss_logZ_info(*kalman.marginalize_first(total))
    return logZ, Ex, ExxT, Exnxt


@f32_linalg
def lds_smoother_timeshard(init, pairs, nodes, mesh, axis="time"):
    """Time-sharded smoother over ``mesh[axis]``: same outputs as
    ``kalman.lds_smoother`` for one sequence -- (logZ, Ex (T,d),
    ExxT (T,d,d), Exnxt (T-1,d,d)) -- with the time axis sharded across
    devices and one all_gather of boundary chain elements as the only
    collective. Requires T divisible by the axis size."""
    N1, N2 = nodes
    T, d = N2.shape
    C = mesh.shape[axis]
    if T % C:
        raise ValueError(f"T={T} not divisible by time-axis size {C}")
    L = T // C
    if L < 2:
        raise ValueError(f"need T >= 2*{C} (device 0 holds the pad row)")
    leaves_pad = build_padded_leaves(init, pairs, nodes)

    # pad pair arrays with one leading dummy row to align with leaf rows
    P1, P2, P3, Pc = pairs
    padm = lambda a: jnp.concatenate([jnp.zeros_like(a[:1]), a], axis=0)
    P1p, P2p, P3p = padm(P1), padm(P2), padm(P3)

    J0_row = -2.0 * (init[0] + N1[0])
    h0_row = init[1] + N2[0]

    body = partial(_local_smoother, axis=axis, C=C, L=L, d=d)
    sharded = _shard_map(
        body, mesh=mesh,
        in_specs=(_tmap(lambda _: P(axis), leaves_pad), P(axis), P(axis),
                  P(axis), P(axis), P(axis), P(), P()),
        out_specs=(P(), P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    logZ, Ex, ExxT, Exnxt_pad = sharded(leaves_pad, N1, N2, P3p, P2p, P1p,
                                        J0_row, h0_row)
    return logZ, Ex, ExxT, Exnxt_pad[1:]
