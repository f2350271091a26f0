"""Float64 sequential NumPy oracles for the message-passing kernels.

These play the role the reference's pure-autograd implementations play for
its Cython kernels (reference: svae/lds/lds_inference.py --
natural_filter_forward_general / natural_smoother_general /
natural_sample_backward_general; svae/hmm/hmm_inference.py -- hmm_logZ):
a slow, numerically-gold implementation every fast path must match, and --
while the reference mount is unavailable -- the measured CPU throughput
denominator for BASELINE.md.

Everything is plain NumPy float64 with O(T) Python loops; see
svae_tpu/ops/__init__.py for the natural-parameter convention.
"""

import numpy as np

LOG2PI = np.log(2.0 * np.pi)


def _gauss_logZ(J, h):
    """log integral exp(-1/2 x^T J x + h^T x) dx."""
    d = len(h)
    L = np.linalg.cholesky(J)
    v = np.linalg.solve(L, h)
    return 0.5 * d * LOG2PI - np.sum(np.log(np.diag(L))) + 0.5 * v @ v


# --------------------------------------------------------------------------
# Dense brute force: build the full (T d x T d) joint Gaussian.
# --------------------------------------------------------------------------


def lds_dense_joint(init, pairs, nodes):
    """Assemble the full joint precision J (Td x Td), potential vector h
    (Td), and the summed constant, for brute-force verification."""
    I1, I2, Ic = init
    P1, P2, P3, Pc = pairs
    N1, N2 = nodes
    T, d = N2.shape
    J = np.zeros((T * d, T * d))
    h = np.zeros(T * d)

    def blk(t, s):
        return slice(t * d, (t + 1) * d), slice(s * d, (s + 1) * d)

    J[blk(0, 0)] += -2.0 * I1
    h[0:d] += I2
    const = float(Ic)
    for t in range(T):
        J[blk(t, t)] += -2.0 * N1[t]
        h[t * d : (t + 1) * d] += N2[t]
    for t in range(T - 1):
        J[blk(t + 1, t + 1)] += -2.0 * P1[t]
        J[blk(t, t)] += -2.0 * P3[t]
        # <x_{t+1} x_t^T, P2> = x_{t+1}^T P2 x_t -> J[t+1,t] += -P2
        J[blk(t + 1, t)] += -P2[t]
        J[blk(t, t + 1)] += -P2[t].T
        const += float(Pc[t])
    return J, h, const


def lds_logZ_dense(init, pairs, nodes):
    J, h, const = lds_dense_joint(init, pairs, nodes)
    return _gauss_logZ(J, h) + const


def lds_moments_dense(init, pairs, nodes):
    """Exact smoothed moments from the dense joint: E[x_t], E[x_t x_t^T],
    E[x_t x_{t+1}^T] (the natural-gradient stats -- SURVEY.md section 3.2)."""
    I1, I2, Ic = init
    N1, N2 = nodes
    T, d = N2.shape
    J, h, _ = lds_dense_joint(init, pairs, nodes)
    Cov = np.linalg.inv(J)
    mu = Cov @ h
    Ex = mu.reshape(T, d)
    ExxT = np.zeros((T, d, d))
    Exnxt = np.zeros((T - 1, d, d))  # E[x_t x_{t+1}^T]
    for t in range(T):
        sl = slice(t * d, (t + 1) * d)
        ExxT[t] = Cov[sl, sl] + np.outer(Ex[t], Ex[t])
    for t in range(T - 1):
        sl, sn = slice(t * d, (t + 1) * d), slice((t + 1) * d, (t + 2) * d)
        Exnxt[t] = Cov[sl, sn] + np.outer(Ex[t], Ex[t + 1])
    return Ex, ExxT, Exnxt


# --------------------------------------------------------------------------
# Sequential O(T) natural-parameter Kalman filter / smoother / sampler.
# --------------------------------------------------------------------------


def lds_filter_seq(init, pairs, nodes):
    """Information-form forward filter.

    Returns (logZ, Jf, hf) where (Jf[t], hf[t]) is the filtered potential on
    x_t (node t included). (reference:
    svae/lds/lds_inference.py:natural_filter_forward_general)
    """
    I1, I2, Ic = init
    P1, P2, P3, Pc = pairs
    N1, N2 = nodes
    T, d = N2.shape
    Jf = np.zeros((T, d, d))
    hf = np.zeros((T, d))
    lognorm = float(Ic)
    J = -2.0 * (I1 + N1[0])
    h = I2 + N2[0]
    Jf[0], hf[0] = J, h
    for t in range(T - 1):
        # marginalize x_t out of  -1/2 x_t^T L x_t + b^T x_t with
        # L = J - 2 P3_t,  b = h + P2_t^T x_{t+1}
        L = J - 2.0 * P3[t]
        Lc = np.linalg.cholesky(0.5 * (L + L.T))
        v = np.linalg.solve(Lc, h)
        # lognorm accumulates the x_{t+1}-independent part
        lognorm += 0.5 * d * LOG2PI - np.sum(np.log(np.diag(Lc))) + 0.5 * v @ v
        lognorm += float(Pc[t])
        Linv_h = np.linalg.solve(L, h)
        Linv_Pt = np.linalg.solve(L, P2[t].T)  # L^-1 P2^T
        J = -2.0 * P1[t] - P2[t] @ Linv_Pt - 2.0 * N1[t + 1]
        h = P2[t] @ Linv_h + N2[t + 1]
        J = 0.5 * (J + J.T)
        Jf[t + 1], hf[t + 1] = J, h
    lognorm += _gauss_logZ(J, h)
    return lognorm, Jf, hf


def lds_backward_seq(pairs, nodes):
    """Information-form backward filter (two-filter smoothing).

    Returns (Jb, hb, cb): beta_t(x_t) = exp(-1/2 x^T Jb[t] x + hb[t]^T x
    + cb[t]) = integral over x_{t+1}..x_T of all pair/node potentials
    strictly after t. beta_T = 0 potential.
    """
    P1, P2, P3, Pc = pairs
    N1, N2 = nodes
    T, d = N2.shape
    Jb = np.zeros((T, d, d))
    hb = np.zeros((T, d))
    cb = np.zeros(T)
    J = np.zeros((d, d))
    h = np.zeros(d)
    c = 0.0
    for t in range(T - 2, -1, -1):
        # integrate x_{t+1}: potential on x_{t+1} is
        #   -1/2 x'^T M x' + (h + N2[t+1])^T x' + x'^T P2_t x_t
        # with M = -2 P1_t - 2 N1_{t+1} + J
        M = -2.0 * P1[t] - 2.0 * N1[t + 1] + J
        b0 = h + N2[t + 1]
        Mc = np.linalg.cholesky(0.5 * (M + M.T))
        logdet = 2.0 * np.sum(np.log(np.diag(Mc)))
        Minv_b0 = np.linalg.solve(M, b0)
        Minv_P2 = np.linalg.solve(M, P2[t])
        c = c + float(Pc[t]) + 0.5 * d * LOG2PI - 0.5 * logdet + 0.5 * b0 @ Minv_b0
        h = P2[t].T @ Minv_b0
        Jnew = -2.0 * P3[t] - P2[t].T @ Minv_P2
        J = 0.5 * (Jnew + Jnew.T)
        Jb[t], hb[t], cb[t] = J, h, c
    return Jb, hb, cb


def lds_smoother_seq(init, pairs, nodes):
    """Sequential two-filter smoother.

    Returns (logZ, Ex, ExxT, Exnxt) with Exnxt[t] = E[x_t x_{t+1}^T].
    (reference: svae/lds/lds_inference.py:natural_smoother_general)
    """
    P1, P2, P3, Pc = pairs
    N1, N2 = nodes
    T, d = N2.shape
    logZ, Jf, hf = lds_filter_seq(init, pairs, nodes)
    Jb, hb, _ = lds_backward_seq(pairs, nodes)
    Ex = np.zeros((T, d))
    ExxT = np.zeros((T, d, d))
    Exnxt = np.zeros((T - 1, d, d))
    Covs = np.zeros((T, d, d))
    for t in range(T):
        Js = Jf[t] + Jb[t]
        Cov = np.linalg.inv(Js)
        mu = Cov @ (hf[t] + hb[t])
        Covs[t] = Cov
        Ex[t] = mu
        ExxT[t] = Cov + np.outer(mu, mu)
    for t in range(T - 1):
        # joint over (x_t, x_{t+1}):
        #   alpha_t(x_t) * pair_t * node_{t+1} * beta_{t+1}(x_{t+1})
        Jj = np.zeros((2 * d, 2 * d))
        Jj[:d, :d] = Jf[t] - 2.0 * P3[t]
        Jj[d:, d:] = -2.0 * P1[t] - 2.0 * N1[t + 1] + Jb[t + 1]
        Jj[d:, :d] = -P2[t]
        Jj[:d, d:] = -P2[t].T
        hj = np.concatenate([hf[t], N2[t + 1] + hb[t + 1]])
        Cj = np.linalg.inv(Jj)
        mj = Cj @ hj
        Exnxt[t] = Cj[:d, d:] + np.outer(mj[:d], mj[d:])
    return logZ, Ex, ExxT, Exnxt


def lds_sample_seq(init, pairs, nodes, eps):
    """Backward sampler: eps is (T, d) standard normal; returns one joint
    posterior sample x_{1:T} (reference:
    svae/lds/lds_inference.py:natural_sample_backward_general)."""
    P1, P2, P3, Pc = pairs
    N1, N2 = nodes
    T, d = N2.shape
    _, Jf, hf = lds_filter_seq(init, pairs, nodes)
    x = np.zeros((T, d))
    # last step: sample from filtered == smoothed at T
    L = np.linalg.cholesky(0.5 * (Jf[-1] + Jf[-1].T))
    mu = np.linalg.solve(Jf[-1], hf[-1])
    x[-1] = mu + np.linalg.solve(L.T, eps[-1])
    for t in range(T - 2, -1, -1):
        # x_t | x_{t+1} ~ potential alpha_t(x_t) * pair_t(x_t, x_{t+1})
        Jc = Jf[t] - 2.0 * P3[t]
        hc = hf[t] + P2[t].T @ x[t + 1]
        Lc = np.linalg.cholesky(0.5 * (Jc + Jc.T))
        mu = np.linalg.solve(Jc, hc)
        x[t] = mu + np.linalg.solve(Lc.T, eps[t])
    return x


# --------------------------------------------------------------------------
# HMM oracles.
# --------------------------------------------------------------------------


def hmm_logZ_seq(log_init, log_trans, log_obs):
    """Sequential log-domain forward recursion.

    log_init: (K,), log_trans: (K, K) rows z_t -> z_{t+1} (may also be
    (T-1, K, K) time-varying), log_obs: (T, K).
    (reference: svae/hmm/hmm_inference.py:hmm_logZ)
    """
    T, K = log_obs.shape
    tv = log_trans.ndim == 3
    a = log_init + log_obs[0]
    for t in range(1, T):
        lt = log_trans[t - 1] if tv else log_trans
        m = a[:, None] + lt
        mx = m.max(axis=0)
        a = mx + np.log(np.exp(m - mx).sum(axis=0)) + log_obs[t]
    mx = a.max()
    return mx + np.log(np.exp(a - mx).sum())


def hmm_logZ_brute(log_init, log_trans, log_obs):
    """Brute-force enumeration over all K^T paths (tiny problems only)."""
    import itertools

    T, K = log_obs.shape
    tv = log_trans.ndim == 3
    total = -np.inf
    for path in itertools.product(range(K), repeat=T):
        lp = log_init[path[0]] + log_obs[0, path[0]]
        for t in range(1, T):
            lt = log_trans[t - 1] if tv else log_trans
            lp += lt[path[t - 1], path[t]] + log_obs[t, path[t]]
        total = np.logaddexp(total, lp)
    return total


def hmm_marginals_seq(log_init, log_trans, log_obs):
    """Forward-backward: returns (logZ, node_marginals (T,K),
    pair_marginals (T-1,K,K) = q(z_t, z_{t+1}))."""
    T, K = log_obs.shape
    tv = log_trans.ndim == 3
    la = np.zeros((T, K))
    lb = np.zeros((T, K))
    la[0] = log_init + log_obs[0]
    for t in range(1, T):
        lt = log_trans[t - 1] if tv else log_trans
        m = la[t - 1][:, None] + lt
        mx = m.max(axis=0)
        la[t] = mx + np.log(np.exp(m - mx).sum(axis=0)) + log_obs[t]
    for t in range(T - 2, -1, -1):
        lt = log_trans[t] if tv else log_trans
        m = lt + (log_obs[t + 1] + lb[t + 1])[None, :]
        mx = m.max(axis=1)
        lb[t] = mx + np.log(np.exp(m - mx[:, None]).sum(axis=1))
    mx = la[-1].max()
    logZ = mx + np.log(np.exp(la[-1] - mx).sum())
    node = np.exp(la + lb - logZ)
    pair = np.zeros((T - 1, K, K))
    for t in range(T - 1):
        lt = log_trans[t] if tv else log_trans
        lp = la[t][:, None] + lt + (log_obs[t + 1] + lb[t + 1])[None, :] - logZ
        pair[t] = np.exp(lp)
    return logZ, node, pair


def gmm_meanfield_seq(e_logpi, E_eta1, E_eta2, const, J_diag, h,
                      num_iters=25):
    """GMM block mean-field E-step, float64 vectorized NumPy -- the CPU
    twin of models/gmm.py:local_meanfield (reference: svae/models/gmm.py
    local_meanfield; the reference's GMM path is pure NumPy/autograd with
    no Cython fast path, so vectorized f64 NumPy IS the
    reference-equivalent implementation and the fair bench denominator).

    Inputs: global expected stats ``e_logpi (K,)``,
    ``E_eta1 (K, d, d)``, ``E_eta2 (K, d)``, ``const (K,)`` (the NIW
    expected Gaussian natparams), and diagonal recognition potentials
    ``J_diag, h (N, d)``. Runs ``num_iters`` coordinate-ascent sweeps of
    q(x) <-> q(z); returns (label_probs (N, K), (ExxT, Ex)).
    """
    e_logpi = np.asarray(e_logpi, np.float64)
    E_eta1 = np.asarray(E_eta1, np.float64)
    E_eta2 = np.asarray(E_eta2, np.float64)
    const = np.asarray(const, np.float64)
    J_diag = np.asarray(J_diag, np.float64)
    h = np.asarray(h, np.float64)
    N, d = h.shape
    K = e_logpi.shape[0]
    eta1_node = np.zeros((N, d, d))
    eta1_node[:, np.arange(d), np.arange(d)] = -0.5 * J_diag
    r = np.full((N, K), 1.0 / K)
    for _ in range(num_iters):
        eta1 = np.einsum("nk,kij->nij", r, E_eta1) + eta1_node
        eta2 = np.einsum("nk,ki->ni", r, E_eta2) + h
        J = -2.0 * eta1
        Sigma = np.linalg.inv(J)
        mu = np.einsum("nij,nj->ni", Sigma, eta2)
        ExxT = Sigma + mu[:, :, None] * mu[:, None, :]
        logits = (e_logpi[None, :]
                  + np.einsum("kij,nij->nk", E_eta1, ExxT)
                  + np.einsum("ki,ni->nk", E_eta2, mu)
                  + const[None, :])
        logits -= logits.max(axis=1, keepdims=True)
        r = np.exp(logits)
        r /= r.sum(axis=1, keepdims=True)
    return r, (ExxT, mu)
