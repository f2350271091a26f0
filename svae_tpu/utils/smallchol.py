"""Statically-unrolled Cholesky and triangular solves for small matrices.

XLA lowers ``jnp.linalg.cholesky`` / ``solve_triangular`` to sequential
While loops with dynamic slicing -- catastrophic for the d x d (d ~ 2..32)
matrices inside the Kalman scan combines, where they serialize an otherwise
fully-vectorized kernel. With d static and small, unrolling
Cholesky-Banachiewicz into d(d+1)/2 elementwise ops turns every step into a
(batch,)-wide VPU op that XLA fuses freely; the O(d^2) extra Python ops are
paid once at trace time. Measured on-chip: 6.5x E-step speedup over the
LAPACK-style lowering (docs/DESIGN.md).

Every public entry point carries a closed-form custom VJP (the textbook
Cholesky / triangular-solve adjoints, themselves evaluated with unrolled
substitutions). Mechanical AD through the unrolled scalar graphs is
correct but catastrophically slow in reverse mode -- the precision-matrix
gradient channel of the LDS train step cost ~50 ms of its 59 ms before
this (ablation, docs/DESIGN.md); the closed forms reuse the forward's
factor and cost two extra solves per cotangent.

All functions are batched over arbitrary leading axes (L broadcasts
against the RHS's batch axes; adjoints un-broadcast by summation),
differentiable (including reverse-over-reverse: the bwd functions are
built from these same primitives), and dtype-polymorphic.
``CHOL_UNROLL_MAX`` bounds the unrolled dimension; larger matrices fall
back to the LAPACK-style primitives.
"""

from functools import partial

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

CHOL_UNROLL_MAX = 32


# --------------------------------------------------------------------------
# raw unrolled kernels (no custom AD -- building blocks)
# --------------------------------------------------------------------------


def chol_unrolled(A):
    """Lower-Cholesky of SPD ``A`` (..., d, d), unrolled over static d.
    Reads only the lower triangle."""
    d = A.shape[-1]
    L = [[None] * d for _ in range(d)]
    for i in range(d):
        for j in range(i + 1):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    zero = jnp.zeros_like(A[..., 0, 0])
    rows = [
        jnp.stack([L[i][j] if j <= i else zero for j in range(d)], axis=-1)
        for i in range(d)
    ]
    return jnp.stack(rows, axis=-2)


def solve_lower_unrolled(L, b):
    """x with L x = b, L lower-triangular (..., d, d), b (..., d)."""
    d = b.shape[-1]
    x = []
    for i in range(d):
        s = b[..., i]
        for k in range(i):
            s = s - L[..., i, k] * x[k]
        x.append(s / L[..., i, i])
    return jnp.stack(x, axis=-1)


def solve_upper_from_lower_unrolled(L, b):
    """x with L^T x = b (backward substitution against the lower factor)."""
    d = b.shape[-1]
    x = [None] * d
    for i in range(d - 1, -1, -1):
        s = b[..., i]
        for k in range(i + 1, d):
            s = s - L[..., k, i] * x[k]
        x[i] = s / L[..., i, i]
    return jnp.stack(x, axis=-1)


# --------------------------------------------------------------------------
# adjoint helpers
# --------------------------------------------------------------------------


def _unbroadcast(x, shape):
    """Sum ``x`` down to ``shape`` (reverse of broadcasting)."""
    if x.shape == tuple(shape):
        return x
    extra = x.ndim - len(shape)
    if extra > 0:
        x = jnp.sum(x, axis=tuple(range(extra)))
    axes = tuple(i for i, (a, b) in enumerate(zip(x.shape, shape))
                 if a != b)
    if axes:
        x = jnp.sum(x, axis=axes, keepdims=True)
    return jnp.reshape(x, shape)


def _tril(x):
    return jnp.tril(x)


def _phi(x):
    """Lower triangle with the diagonal halved (the Cholesky adjoint's
    projection)."""
    return jnp.tril(x) - 0.5 * jnp.triu(jnp.tril(x), 0) * jnp.eye(
        x.shape[-1], dtype=x.dtype
    )


# --------------------------------------------------------------------------
# custom-VJP'd public primitives
# --------------------------------------------------------------------------


@jax.custom_vjp
def solve_lower(L, b):
    """x = L^{-1} b; b (..., d), L (..., d, d) broadcasting against b."""
    return _solve_lower_impl(L, b)


def _solve_lower_impl(L, b):
    if L.shape[-1] <= CHOL_UNROLL_MAX:
        return solve_lower_unrolled(L, b)
    return jsl.solve_triangular(_bcast(L, b.shape[:-1]), b[..., None],
                                lower=True)[..., 0]


def _solve_lower_fwd(L, b):
    x = _solve_lower_impl(L, b)
    return x, (L, x)


def _solve_lower_bwd(res, xbar):
    # L x = b:  bbar = L^{-T} xbar,  Lbar = -tril(bbar (x) x)
    L, x = res
    bbar = _solve_upper_impl(L, xbar)
    Lbar = -_tril(bbar[..., :, None] * x[..., None, :])
    return _unbroadcast(Lbar, L.shape), bbar


solve_lower.defvjp(_solve_lower_fwd, _solve_lower_bwd)


@jax.custom_vjp
def solve_upper_from_lower(L, b):
    """x = L^{-T} b; b (..., d), L (..., d, d) broadcasting against b."""
    return _solve_upper_impl(L, b)


def _solve_upper_impl(L, b):
    if L.shape[-1] <= CHOL_UNROLL_MAX:
        return solve_upper_from_lower_unrolled(L, b)
    return jsl.solve_triangular(_bcast(L, b.shape[:-1]), b[..., None],
                                lower=True, trans=1)[..., 0]


def _solve_upper_fwd(L, b):
    x = _solve_upper_impl(L, b)
    return x, (L, x)


def _solve_upper_bwd(res, xbar):
    # L^T x = b:  bbar = L^{-1} xbar,  Lbar = -tril(x (x) bbar)
    L, x = res
    bbar = _solve_lower_impl(L, xbar)
    Lbar = -_tril(x[..., :, None] * bbar[..., None, :])
    return _unbroadcast(Lbar, L.shape), bbar


solve_upper_from_lower.defvjp(_solve_upper_fwd, _solve_upper_bwd)


def _solve_lower_mat(L, B):
    """L^{-1} B for matrix B (..., d, m) via the column-batch trick."""
    y = solve_lower(L[..., None, :, :], jnp.swapaxes(B, -1, -2))
    return jnp.swapaxes(y, -1, -2)


def _solve_upper_mat(L, B):
    """L^{-T} B for matrix B (..., d, m)."""
    y = solve_upper_from_lower(L[..., None, :, :], jnp.swapaxes(B, -1, -2))
    return jnp.swapaxes(y, -1, -2)


@jax.custom_vjp
def chol(A):
    """Lower-Cholesky of SPD ``A``; reads only the lower triangle (callers
    symmetrize first). Dispatch: unrolled for d <= CHOL_UNROLL_MAX, else
    lax cholesky."""
    return _chol_impl(A)


def _chol_impl(A):
    if A.shape[-1] <= CHOL_UNROLL_MAX:
        return chol_unrolled(A)
    return jnp.linalg.cholesky(A)


def _chol_fwd(A):
    L = _chol_impl(A)
    return L, L


def _chol_bwd(L, Lbar):
    # standard Cholesky adjoint: Abar = L^{-T} phi(L^T Lbar) L^{-1},
    # symmetrized (the forward reads tril(A) of a symmetrized input; the
    # symmetric form keeps grad(sym(A)) exact and matches jnp.linalg).
    W = _phi(jnp.swapaxes(L, -1, -2) @ Lbar)
    # S = L^{-T} W L^{-1}:  Y = L^{-T} W, then S = Y L^{-1} = (L^{-T} Y^T)^T
    Y = _solve_upper_mat(L, W)
    S = jnp.swapaxes(_solve_upper_mat(L, jnp.swapaxes(Y, -1, -2)), -1, -2)
    Abar = 0.5 * (S + jnp.swapaxes(S, -1, -2))
    return (Abar,)


chol.defvjp(_chol_fwd, _chol_bwd)


# --------------------------------------------------------------------------
# composite solves (VJPs compose from the primitives above)
# --------------------------------------------------------------------------


def cho_solve_vec_unrolled(L, b):
    """Solve A x = b given A = L L^T; b (..., d) (broadcasts against L)."""
    return solve_upper_from_lower(L, solve_lower(L, b))


def cho_solve_mat_unrolled(L, B):
    """Solve A X = B given A = L L^T; B (..., d, m)."""
    return _solve_upper_mat(L, _solve_lower_mat(L, B))


def _bcast(L, b_batch_shape):
    """LAPACK-style primitives do not broadcast batch dims; do it by hand."""
    return jnp.broadcast_to(L, tuple(b_batch_shape) + L.shape[-2:])


def cho_solve(L, b):
    """Vector-RHS solve A x = b with A = L L^T; b (..., d). The vector vs
    matrix distinction is in the FUNCTION, not the shapes -- a batched
    vector (B, d) with unbatched L is indistinguishable from a (d, m)
    matrix, so there is no reliable shape-based dispatch. Broadcasts L's
    batch dims against b's."""
    return cho_solve_vec_unrolled(L, b)


def cho_solve_mat(L, B):
    """Matrix-RHS solve A X = B with A = L L^T; B (..., d, m)."""
    return cho_solve_mat_unrolled(L, B)
