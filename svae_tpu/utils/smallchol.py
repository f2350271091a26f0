"""Statically-unrolled Cholesky and triangular solves for small matrices.

XLA lowers ``jnp.linalg.cholesky`` / ``solve_triangular`` to sequential
While loops with dynamic slicing -- catastrophic for the d x d (d ~ 2..32)
matrices inside the Kalman scan combines, where they serialize an otherwise
fully-vectorized kernel. With d static and small, unrolling
Cholesky-Banachiewicz into d(d+1)/2 elementwise ops turns every step into a
(batch,)-wide VPU op that XLA fuses freely; the O(d^2) extra Python ops are
paid once at trace time.

All functions are batched over arbitrary leading axes, differentiable, and
dtype-polymorphic. ``CHOL_UNROLL_MAX`` bounds the unrolled dimension;
larger matrices fall back to the LAPACK-style primitives.
"""

import jax.numpy as jnp
import jax.scipy.linalg as jsl

CHOL_UNROLL_MAX = 32


def chol_unrolled(A):
    """Lower-Cholesky of SPD ``A`` (..., d, d), unrolled over static d."""
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


def cho_solve_vec_unrolled(L, b):
    """Solve A x = b given A = L L^T; b (..., d) (broadcasts against L)."""
    y = solve_lower_unrolled(L, b)
    return solve_upper_from_lower_unrolled(L, y)


def cho_solve_mat_unrolled(L, B):
    """Solve A X = B given A = L L^T; B (..., d, m) (matrix columns are
    treated as a broadcast batch axis)."""
    y = solve_lower_unrolled(L[..., None, :, :], jnp.swapaxes(B, -1, -2))
    x = solve_upper_from_lower_unrolled(L[..., None, :, :], y)
    return jnp.swapaxes(x, -1, -2)


def chol(A):
    """Dispatch: unrolled for d <= CHOL_UNROLL_MAX, else lax cholesky."""
    if A.shape[-1] <= CHOL_UNROLL_MAX:
        return chol_unrolled(A)
    return jnp.linalg.cholesky(A)


def _bcast(L, b_batch_shape):
    """LAPACK-style primitives do not broadcast batch dims; do it by hand."""
    return jnp.broadcast_to(L, tuple(b_batch_shape) + L.shape[-2:])


def cho_solve(L, b):
    """Vector-RHS solve A x = b with A = L L^T; b (..., d). The vector vs
    matrix distinction is in the FUNCTION, not the shapes -- a batched
    vector (B, d) with unbatched L is indistinguishable from a (d, m)
    matrix, so there is no reliable shape-based dispatch. Broadcasts L's
    batch dims against b's."""
    if L.shape[-1] <= CHOL_UNROLL_MAX:
        return cho_solve_vec_unrolled(L, b)
    return jsl.cho_solve((_bcast(L, b.shape[:-1]), True),
                         b[..., None])[..., 0]


def cho_solve_mat(L, B):
    """Matrix-RHS solve A X = B with A = L L^T; B (..., d, m)."""
    if L.shape[-1] <= CHOL_UNROLL_MAX:
        return cho_solve_mat_unrolled(L, B)
    return jsl.cho_solve((_bcast(L, B.shape[:-2]), True), B)


def solve_lower(L, b):
    if L.shape[-1] <= CHOL_UNROLL_MAX:
        return solve_lower_unrolled(L, b)
    return jsl.solve_triangular(_bcast(L, b.shape[:-1]), b[..., None],
                                lower=True)[..., 0]


def solve_upper_from_lower(L, b):
    """Solve L^T x = b."""
    if L.shape[-1] <= CHOL_UNROLL_MAX:
        return solve_upper_from_lower_unrolled(L, b)
    return jsl.solve_triangular(_bcast(L, b.shape[:-1]), b[..., None],
                                lower=True, trans=1)[..., 0]
