"""ctypes bindings for the native C++ sequential kernels (native/).

The library is (re)built lazily with g++ on first use when the committed
source's content hash differs from the one recorded at the last build (a
sidecar ``.src_sha`` file; mtimes are NOT used -- git does not preserve
them, so a stale foreign-built binary could otherwise be loaded silently
on a fresh checkout). Everything degrades gracefully (``available``
returns False) on hosts without a toolchain. API mirrors
``svae_tpu/ops/oracles.py`` (same shapes, float64).
"""

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_SRC_DIR, "svae_native.cpp"))
_LIB = os.path.abspath(os.path.join(_SRC_DIR, "libsvae_native.so"))
_STAMP = _LIB + ".src_sha"

_lib = None
_build_error = None


def _src_sha():
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _build(sha):
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)
    with open(_STAMP, "w") as f:
        f.write(sha)


def _stamp_matches(sha):
    try:
        with open(_STAMP) as f:
            return f.read().strip() == sha
    except OSError:
        return False


def _load():
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return _lib
    try:
        sha = _src_sha()
        if not os.path.exists(_LIB) or not _stamp_matches(sha):
            _build(sha)
        lib = ctypes.CDLL(_LIB)
    except Exception as e:  # no toolchain / load failure
        _build_error = e
        return None
    dp = ctypes.POINTER(ctypes.c_double)
    lib.lds_filter_seq.restype = ctypes.c_int
    lib.lds_smoother_seq.restype = ctypes.c_int
    lib.lds_sample_seq.restype = ctypes.c_int
    lib.hmm_marginals_seq.restype = ctypes.c_int
    _lib = lib
    return _lib


def available():
    return _load() is not None


def _p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _prep(init, pairs, nodes):
    I1, I2, Ic = init
    P1, P2, P3, Pc = pairs
    N1, N2 = nodes
    c = lambda a: np.ascontiguousarray(a, dtype=np.float64)
    return (c(I1), c(I2), float(Ic), c(P1), c(P2), c(P3), c(Pc), c(N1),
            c(N2))


def lds_smoother_seq(init, pairs, nodes):
    """Native twin of oracles.lds_smoother_seq: (logZ, Ex, ExxT, Exnxt)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native kernels unavailable: {_build_error}")
    I1, I2, Ic, P1, P2, P3, Pc, N1, N2 = _prep(init, pairs, nodes)
    T, d = N2.shape
    logZ = np.zeros(1)
    Ex = np.zeros((T, d))
    ExxT = np.zeros((T, d, d))
    Exnxt = np.zeros((T - 1, d, d))
    rc = lib.lds_smoother_seq(
        _p(I1), _p(I2), ctypes.c_double(Ic), _p(P1), _p(P2), _p(P3), _p(Pc),
        _p(N1), _p(N2), ctypes.c_int(T), ctypes.c_int(d), _p(logZ), _p(Ex),
        _p(ExxT), _p(Exnxt))
    if rc != 0:
        raise FloatingPointError(f"native smoother cholesky failed (rc={rc})")
    return float(logZ[0]), Ex, ExxT, Exnxt


def lds_filter_seq(init, pairs, nodes):
    """Native twin of oracles.lds_filter_seq: (logZ, Jf, hf)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native kernels unavailable: {_build_error}")
    I1, I2, Ic, P1, P2, P3, Pc, N1, N2 = _prep(init, pairs, nodes)
    T, d = N2.shape
    Jf = np.zeros((T, d, d))
    hf = np.zeros((T, d))
    logZ = np.zeros(1)
    rc = lib.lds_filter_seq(
        _p(I1), _p(I2), ctypes.c_double(Ic), _p(P1), _p(P2), _p(P3), _p(Pc),
        _p(N1), _p(N2), ctypes.c_int(T), ctypes.c_int(d), _p(Jf), _p(hf),
        _p(logZ))
    if rc != 0:
        raise FloatingPointError(f"native filter cholesky failed (rc={rc})")
    return float(logZ[0]), Jf, hf


def lds_sample_seq(init, pairs, nodes, eps):
    """Native twin of oracles.lds_sample_seq: one posterior draw (T, d)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native kernels unavailable: {_build_error}")
    I1, I2, Ic, P1, P2, P3, Pc, N1, N2 = _prep(init, pairs, nodes)
    T, d = N2.shape
    eps = np.ascontiguousarray(eps, dtype=np.float64)
    x = np.zeros((T, d))
    rc = lib.lds_sample_seq(
        _p(I1), _p(I2), ctypes.c_double(Ic), _p(P1), _p(P2), _p(P3), _p(Pc),
        _p(N1), _p(N2), _p(eps), ctypes.c_int(T), ctypes.c_int(d), _p(x))
    if rc != 0:
        raise FloatingPointError(f"native sampler cholesky failed (rc={rc})")
    return x


def hmm_marginals_seq(log_init, log_trans, log_obs):
    """Native twin of oracles.hmm_marginals_seq for homogeneous
    transitions: (logZ, node_marginals, summed pair counts)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native kernels unavailable: {_build_error}")
    c = lambda a: np.ascontiguousarray(a, dtype=np.float64)
    log_init, log_trans, log_obs = c(log_init), c(log_trans), c(log_obs)
    T, K = log_obs.shape
    logZ = np.zeros(1)
    node = np.zeros((T, K))
    pair = np.zeros((K, K))
    rc = lib.hmm_marginals_seq(
        _p(log_init), _p(log_trans), _p(log_obs), ctypes.c_int(T),
        ctypes.c_int(K), _p(logZ), _p(node), _p(pair))
    if rc != 0:
        raise FloatingPointError(f"native hmm failed (rc={rc})")
    return float(logZ[0]), node, pair
