"""Positive-definite matrix helpers used by the expfam layer and the Kalman
kernels.

All routines are Cholesky-based (TPU-friendly: batched small-matrix cholesky
and triangular solves lower to dense vectorized XLA ops) and
dtype-polymorphic; they ``vmap``/``scan`` cleanly. Precisions are
symmetrized before factorization -- the f32 numerics mitigation called out in
SURVEY.md section 7 (hard part 1).

TPU precision note: the MXU's default f32 matmul truncates operands to
bfloat16, which is enough to break positive-definiteness inside chained
Schur complements (observed: NaNs in the SLDS E-step on-device). All
factorizations/solves here therefore run under
``jax.default_matmul_precision("float32")`` -- these are tiny (d x d)
matmuls, so full-precision passes cost nothing; the large recognition-net /
HMM matmuls elsewhere keep the fast default.
"""

from functools import wraps

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from svae_tpu.utils import smallchol


def f32_linalg(fn):
    """Trace ``fn`` under full-f32 matmul precision (see module docstring)."""

    @wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped


def symmetrize(a):
    """(a + a^T)/2 on the last two axes."""
    return 0.5 * (a + jnp.swapaxes(a, -1, -2))


@f32_linalg
def _chol(a):
    return smallchol.chol(symmetrize(a))


@f32_linalg
def solve_psd(a, b):
    """Solve ``a x = b`` for SPD ``a``; matrix RHS ``b`` (..., d, m)."""
    L = _chol(a)
    return smallchol.cho_solve_mat(L, b)


@f32_linalg
def cho_solve_psd(L, b):
    """Matrix-RHS solve given a precomputed lower-Cholesky factor."""
    return smallchol.cho_solve_mat(L, b)


@f32_linalg
def logdet_psd(a):
    """log|a| for symmetric positive-definite ``a`` (batched ok)."""
    L = _chol(a)
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)


@f32_linalg
def inv_psd(a):
    """Inverse of a symmetric positive-definite matrix via Cholesky."""
    L = _chol(a)
    eye = jnp.broadcast_to(jnp.eye(a.shape[-1], dtype=a.dtype), a.shape)
    return cho_solve_psd(L, eye)


@f32_linalg
def mvn_logZ_info(J, h):
    """Log-partition of an unnormalized Gaussian in info form.

    ``log integral exp(-1/2 x^T J x + h^T x) dx
      = d/2 log(2 pi) - 1/2 log|J| + 1/2 h^T J^{-1} h``

    This is the per-step lognorm accumulator of the natural-parameter Kalman
    filter (reference: svae/lds/lds_inference.py:natural_lognorm).
    """
    d = h.shape[-1]
    L = _chol(J)
    v = smallchol.solve_lower(L, h)
    half_quad = 0.5 * jnp.sum(v * v, axis=-1)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    return 0.5 * d * jnp.log(2 * jnp.pi).astype(h.dtype) - 0.5 * logdet + half_quad
