"""Synthetic data generators.

NumPy on host (data synthesis is not a device workload); everything takes an
explicit seed and returns float32 arrays ready to feed the device.
"""

import numpy as np


def make_pinwheel(seed=0, num_classes=5, num_per_class=100, radial_std=0.3,
                  tangential_std=0.05, rate=0.25):
    """2D pinwheel: ``num_classes`` spiral arms, ``num_per_class`` points
    each, shuffled. The GMM-SVAE headline dataset
    (reference: experiments/gmm_svae_synth.py:make_pinwheel_data)."""
    rng = np.random.RandomState(seed)
    rads = np.linspace(0, 2 * np.pi, num_classes, endpoint=False)
    features = rng.randn(num_classes * num_per_class, 2) * np.array(
        [radial_std, tangential_std]
    )
    features[:, 0] += 1.0
    labels = np.repeat(np.arange(num_classes), num_per_class)
    angles = rads[labels] + rate * np.exp(features[:, 0])
    rotations = np.stack(
        [np.cos(angles), -np.sin(angles), np.sin(angles), np.cos(angles)],
        axis=-1,
    ).reshape(-1, 2, 2)
    data = np.einsum("ni,nij->nj", features, rotations)
    perm = rng.permutation(len(data))
    return data[perm].astype(np.float32)


def make_dot_data(seed=0, num_seqs=64, T=100, image_width=20, dot_width=3,
                  v=0.3, noise_std=0.05):
    """1D bouncing-dot image sequences: a dot of ``dot_width`` pixels moves
    at velocity ``v`` px/frame and reflects off the walls; each frame is a
    1D image row (width ``image_width``). Returns (num_seqs, T, image_width)
    (reference: experiments/lds_svae_synth.py:make_dot_data)."""
    rng = np.random.RandomState(seed)
    xs = np.arange(image_width)
    out = np.empty((num_seqs, T, image_width), np.float32)
    span = image_width - dot_width
    for s in range(num_seqs):
        pos = rng.uniform(0, span)
        vel = v * rng.choice([-1.0, 1.0])
        for t in range(T):
            # triangle-wave reflection keeps pos in [0, span]
            p = np.abs(((pos + span) % (2 * span)) - span)
            center = p + 0.5 * (dot_width - 1)
            out[s, t] = np.exp(-0.5 * ((xs - center) / (dot_width / 2.0)) ** 2)
            pos += vel
    out += noise_std * rng.randn(*out.shape)
    return out.astype(np.float32)


def rand_lds(seed=0, d=2, eigmax=0.9, q_scale=0.1):
    """Random stable LDS (A with spectral radius <= eigmax, Q = q_scale I)
    (reference: svae/lds/synthetic_data.py:rand_lds)."""
    rng = np.random.RandomState(seed)
    A = rng.randn(d, d)
    A *= eigmax / max(np.abs(np.linalg.eigvals(A)))
    Q = q_scale * np.eye(d)
    mu0 = np.zeros(d)
    S0 = np.eye(d)
    return A, Q, mu0, S0


def lds_rollout(A, Q, mu0, S0, T, seed=0, num_seqs=1):
    """Sample trajectories x_{1:T} from the LDS prior; (num_seqs, T, d)."""
    rng = np.random.RandomState(seed)
    d = A.shape[0]
    Lq = np.linalg.cholesky(Q)
    L0 = np.linalg.cholesky(S0)
    xs = np.empty((num_seqs, T, d))
    x = mu0 + rng.randn(num_seqs, d) @ L0.T
    for t in range(T):
        xs[:, t] = x
        x = x @ A.T + rng.randn(num_seqs, d) @ Lq.T
    return xs.astype(np.float32)
