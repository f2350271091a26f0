"""Row-packed small-matrix algebra for Pallas TPU kernels.

Inside the Kalman kernels (svae_tpu/ops/pallas_kalman.py, pallas_vjp.py)
a d x d matrix is a LIST of d*d lane vectors (row-major: entry (i, j) at
index i*d + j, each element a (B,)-wide value on the 128-lane axis) and a
vector is a list of d lane vectors. With d static and small every helper
below unrolls into (B,)-wide VPU ops that Mosaic schedules freely -- the
same statically-unrolled strategy as svae_tpu/utils/smallchol.py, but on
the kernel-side layout. The kernel body is traced once per pallas_call, so
the O(d^3) Python loops are paid at trace time only.

Cholesky factors are dicts {(i, j): lane vector, j <= i} (the sparse form
the unrolled substitutions consume).
"""

import jax.numpy as jnp


# --------------------------------------------------------------------------
# elementwise / structural
# --------------------------------------------------------------------------


def transpose(A, d):
    return [A[j * d + i] for i in range(d) for j in range(d)]


def add(A, B):
    return [a + b for a, b in zip(A, B)]


def sub(A, B):
    return [a - b for a, b in zip(A, B)]


def scale(A, s):
    return [s * a for a in A]


def sym(A, d):
    At = transpose(A, d)
    return [0.5 * (a + at) for a, at in zip(A, At)]


def outer(x, y, d):
    """x y^T for d-vectors."""
    return [x[i] * y[j] for i in range(d) for j in range(d)]


def tril(A, d):
    """Zero the strict upper triangle."""
    z = jnp.zeros_like(A[0])
    return [A[i * d + j] if j <= i else z for i in range(d)
            for j in range(d)]


def phi(A, d):
    """Lower triangle with the diagonal halved (Cholesky-adjoint
    projection, cf. smallchol._phi)."""
    z = jnp.zeros_like(A[0])
    out = []
    for i in range(d):
        for j in range(d):
            if j < i:
                out.append(A[i * d + j])
            elif j == i:
                out.append(0.5 * A[i * d + j])
            else:
                out.append(z)
    return out


# --------------------------------------------------------------------------
# products
# --------------------------------------------------------------------------


def matvec(A, x, d):
    """A x."""
    return [sum(A[i * d + k] * x[k] for k in range(d)) for i in range(d)]


def matvec_T(A, x, d):
    """A^T x."""
    return [sum(A[k * d + i] * x[k] for k in range(d)) for i in range(d)]


def matmul(A, B, d):
    """A B."""
    return [
        sum(A[i * d + k] * B[k * d + j] for k in range(d))
        for i in range(d) for j in range(d)
    ]


def matmul_TN(A, B, d):
    """A^T B."""
    return [
        sum(A[k * d + i] * B[k * d + j] for k in range(d))
        for i in range(d) for j in range(d)
    ]


def matmul_NT(A, B, d):
    """A B^T."""
    return [
        sum(A[i * d + k] * B[j * d + k] for k in range(d))
        for i in range(d) for j in range(d)
    ]


def dot(x, y):
    return sum(a * b for a, b in zip(x, y))


# --------------------------------------------------------------------------
# Cholesky / solves (unrolled Cholesky-Banachiewicz; reads lower triangle)
# --------------------------------------------------------------------------


def chol(A, d):
    """dict {(i, j): lane vec} lower factor of SPD row-list A."""
    L = {}
    for i in range(d):
        for j in range(i + 1):
            s = A[i * d + j]
            for k in range(j):
                s = s - L[(i, k)] * L[(j, k)]
            if i == j:
                L[(i, j)] = jnp.sqrt(s)
            else:
                L[(i, j)] = s / L[(j, j)]
    return L


def chol_dense(L, d):
    """Factor dict -> row-list (zeros above the diagonal)."""
    z = jnp.zeros_like(L[(0, 0)])
    return [L[(i, j)] if j <= i else z for i in range(d) for j in range(d)]


def logdet_from_chol(L, d):
    return 2.0 * sum(jnp.log(L[(i, i)]) for i in range(d))


def solve_lower(L, b, d):
    """L x = b (forward substitution)."""
    x = []
    for i in range(d):
        s = b[i]
        for k in range(i):
            s = s - L[(i, k)] * x[k]
        x.append(s / L[(i, i)])
    return x


def solve_upper(L, b, d):
    """L^T x = b (backward substitution against the lower factor)."""
    x = [None] * d
    for i in range(d - 1, -1, -1):
        s = b[i]
        for k in range(i + 1, d):
            s = s - L[(k, i)] * x[k]
        x[i] = s / L[(i, i)]
    return x


def cho_solve(L, b, d):
    """(L L^T)^{-1} b."""
    return solve_upper(L, solve_lower(L, b, d), d)


def cho_inverse(L, d):
    """(L L^T)^{-1} as a row-list, via d unit-vector solves."""
    one = jnp.ones_like(L[(0, 0)])
    zero = jnp.zeros_like(one)
    cols = []
    for c in range(d):
        e = [one if i == c else zero for i in range(d)]
        cols.append(cho_solve(L, e, d))
    # cols[c][i] = W[i, c]
    return [cols[j][i] for i in range(d) for j in range(d)]


def solve_lower_mat(L, B, d):
    """L^{-1} B columnwise for row-list B."""
    cols = []
    for c in range(d):
        cols.append(solve_lower(L, [B[i * d + c] for i in range(d)], d))
    return [cols[j][i] for i in range(d) for j in range(d)]


def solve_upper_mat(L, B, d):
    """L^{-T} B columnwise for row-list B."""
    cols = []
    for c in range(d):
        cols.append(solve_upper(L, [B[i * d + c] for i in range(d)], d))
    return [cols[j][i] for i in range(d) for j in range(d)]


def chol_vjp(L, Lbar, d):
    """Cholesky adjoint: given lower factor dict L and row-list cotangent
    Lbar (lower), return Abar = 0.5 (S + S^T) with
    S = L^{-T} phi(L^T Lbar) L^{-1} (the textbook formula,
    cf. smallchol._chol_bwd)."""
    X = matmul_TN(chol_dense(L, d), Lbar, d)
    P = phi(X, d)
    Y = solve_upper_mat(L, P, d)  # L^{-T} P
    S_T = solve_upper_mat(L, transpose(Y, d), d)  # L^{-T} Y^T = S^T
    S = transpose(S_T, d)
    return [0.5 * (s + st) for s, st in zip(S, S_T)]
