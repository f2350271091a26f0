"""Headline benchmark (driver-run on the real chip).

Measures LDS-SVAE SVI throughput (BASELINE config 2: bouncing-dot
sequences, T=100) as end-to-end training-step sequences/sec on one chip --
recognition MLP + Kalman E-step (sequential-scan smoother + 2-particle
sampler) + decoder ELBO + natural-gradient/adam update, all inside one
jitted step; the fused Pallas E-step is reported alongside.

``vs_baseline`` divides by the strongest CPU E-step available on the host
(native C++ twin of the reference's Cython kernels, else the NumPy f64
oracle) -- the stand-in for the reference while its mount is empty
(BASELINE.md measurement plan; the denominator omits the reference's
would-be net/decoder cost, conservative in its favor).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import time

import numpy as np

# Persistent compilation cache: the unrolled-linalg scan programs compile
# for minutes on this 1-core host; cache hits make repeat runs instant.
os.makedirs(os.path.join(os.path.dirname(__file__), ".jax_cache"),
            exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)



def _lump_time(run_iters, iters):
    """Time `iters` chained async dispatches, fenced once at the end; do it
    twice and keep the slower pass. Per-step fencing is wrong on this
    setup (the axon tunnel costs ~25 ms per sync round-trip, swamping
    sub-10 ms kernels); chained lump timing measures sustained device
    throughput, and taking the slower of two passes rejects bogus-fast
    artifacts seen under host CPU contention."""
    dts = []
    for _ in range(2):
        t0 = time.perf_counter()
        out = run_iters(iters)
        jax.block_until_ready(out)
        dts.append((time.perf_counter() - t0) / iters)
    return max(dts)


def measure_tpu_steps(B=64, T=100, d_obs=20, d_latent=10, num_samples=2,
                      iters=20):
    import jax
    import jax.numpy as jnp
    from svae_tpu.data import make_dot_data
    from svae_tpu.models import lds
    from svae_tpu.nets import recognition, decoders
    from svae_tpu.train import loop as loop_lib

    data = jnp.asarray(make_dot_data(num_seqs=B, T=T, image_width=d_obs))
    N = 50 * B
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    pgm_prior = lds.init_pgm_param(k1, d_latent)
    pgm_params = lds.init_pgm_param(k2, d_latent)
    net_params = (
        recognition.init_mlp_recognize(k3, d_obs, (64,), d_latent),
        decoders.init_mlp_decode(k4, d_latent, (64,), d_obs),
    )
    opt_init, train_step = loop_lib.make_train_step(
        lds.run_inference, recognition.mlp_recognize, decoders.mlp_loglike,
        pgm_prior, N, num_samples=num_samples, donate=False,
    )
    opt_state = opt_init(pgm_params, net_params)

    state = [pgm_params, net_params, opt_state, None]
    # warmup/compile
    p, n, st, e, _ = train_step(state[0], state[1], state[2], data,
                                jax.random.PRNGKey(1))
    jax.block_until_ready(e)
    state = [p, n, st, e]

    def run_iters(k):
        p, n, st, e = state
        for i in range(k):
            p, n, st, e, _ = train_step(p, n, st, data,
                                        jax.random.PRNGKey(2 + i))
        state[:] = [p, n, st, e]
        return e

    dt = _lump_time(run_iters, iters)
    assert bool(np.isfinite(float(state[3]))), "non-finite ELBO in benchmark"
    return B / dt, dt


def measure_cpu_oracle(T=100, d_latent=10, reps=8):
    """Sequential f64 smoother+sampler per-sequence time on CPU -- the
    reference-equivalent E-step. Uses the native C++ kernels (native/,
    the stand-in for the reference's Cython fast path) when a toolchain is
    present, else the NumPy oracle; returns the FASTER of the two so the
    denominator is the strongest available CPU implementation."""
    from svae_tpu.ops import oracles, native

    rng = np.random.RandomState(0)
    d = d_latent
    A = 0.9 * np.linalg.qr(rng.randn(d, d))[0]
    Q = 0.1 * np.eye(d)
    I1 = -0.5 * np.eye(d)
    I2 = np.zeros(d)
    Ic = 0.0
    Qi = np.linalg.inv(Q)
    P1 = np.tile(-0.5 * Qi, (T - 1, 1, 1))
    P2 = np.tile(Qi @ A, (T - 1, 1, 1))
    P3 = np.tile(-0.5 * A.T @ Qi @ A, (T - 1, 1, 1))
    Pc = np.zeros(T - 1)
    N1 = np.tile(-0.5 * np.eye(d), (T, 1, 1))
    N2 = rng.randn(T, d)
    init, pairs, nodes = (I1, I2, Ic), (P1, P2, P3, Pc), (N1, N2)
    eps = rng.randn(T, d)

    def time_impl(smoother, sampler, n):
        smoother(init, pairs, nodes)  # warmup
        t0 = time.perf_counter()
        for _ in range(n):
            smoother(init, pairs, nodes)
            sampler(init, pairs, nodes, eps)
            sampler(init, pairs, nodes, eps)  # 2 particles
        return 1.0 / ((time.perf_counter() - t0) / n)

    best = time_impl(oracles.lds_smoother_seq, oracles.lds_sample_seq, reps)
    if native.available():
        best = max(best, time_impl(native.lds_smoother_seq,
                                   native.lds_sample_seq, 8 * reps))
    return best


def measure_tpu_estep(B=64, T=100, d_obs=20, d_latent=10, num_samples=2,
                      iters=20):
    """E-step only (smoother + sampler through the model contract), the
    apples-to-apples twin of measure_cpu_oracle."""
    import jax
    import jax.numpy as jnp
    from svae_tpu.models import lds

    key = jax.random.PRNGKey(0)
    glob = lds.init_pgm_param(key, d_latent)
    k1, k2 = jax.random.split(key)
    J = jax.nn.softplus(jax.random.normal(k1, (B, T, d_latent))) + 0.5
    h = jax.random.normal(k2, (B, T, d_latent))
    f = jax.jit(lambda pots, k: lds.run_inference(glob, glob, pots, k,
                                                  num_samples))
    out = f((J, h), jax.random.PRNGKey(1))
    jax.block_until_ready(out)

    def run_iters(k):
        for i in range(k):
            out = f((J, h), jax.random.PRNGKey(2 + i))
        return out

    dt = _lump_time(run_iters, iters)
    assert bool(np.isfinite(float(out[3]))), "non-finite local KL"
    return B / dt


def measure_tpu_pallas_estep(B=64, T=100, d_latent=10, num_samples=2,
                             iters=50):
    """The fused Pallas E-step (filter + smoother + sampler sharing one
    filter pass) -- the apples-to-apples twin of measure_tpu_estep on the
    Pallas kernels (forward-only path)."""
    import jax
    import jax.numpy as jnp
    from svae_tpu.models import lds
    from svae_tpu.ops.pallas_kalman import lds_estep_pallas

    key = jax.random.PRNGKey(0)
    glob = lds.init_pgm_param(key, d_latent)
    init, pairs = lds.expected_chain_potentials(glob, T)
    k1, k2 = jax.random.split(key)
    Jd = jax.nn.softplus(jax.random.normal(k1, (B, T, d_latent))) + 0.5
    h = jax.random.normal(k2, (B, T, d_latent))
    N1 = -0.5 * jax.vmap(jax.vmap(jnp.diag))(Jd)
    f = jax.jit(lambda N1, h, k: lds_estep_pallas(init, pairs, (N1, h), k,
                                                  num_samples))
    out = f(N1, h, jax.random.PRNGKey(1))
    jax.block_until_ready(out)

    def run_iters(k):
        for i in range(k):
            out = f(N1, h, jax.random.PRNGKey(2 + i))
        return out

    dt = _lump_time(run_iters, iters)
    assert bool(np.isfinite(float(out[2][0]))), "non-finite pallas logZ"
    return B / dt


def main():
    estep_seqs_per_sec = measure_tpu_estep()
    try:
        pallas_seqs_per_sec = measure_tpu_pallas_estep()
    except Exception:  # CPU-only host or pallas lowering unavailable
        pallas_seqs_per_sec = None
    train_seqs_per_sec, step_dt = measure_tpu_steps()
    cpu_seqs_per_sec = measure_cpu_oracle()
    print(
        json.dumps(
            {
                # the BASELINE.json metric pair: E-step seqs/sec (chip vs
                # the strongest CPU E-step implementation -- the native C++
                # twin of the reference's Cython kernels), plus the full
                # SVI train-step throughput for context.
                "metric": "lds_svae_T100_estep_seqs_per_sec_per_chip",
                "value": round(estep_seqs_per_sec, 2),
                "unit": "seqs/sec",
                "vs_baseline": round(
                    estep_seqs_per_sec / cpu_seqs_per_sec, 2),
                "train_step_seqs_per_sec": round(train_seqs_per_sec, 2),
                "cpu_estep_seqs_per_sec": round(cpu_seqs_per_sec, 2),
                "pallas_estep_seqs_per_sec": (
                    round(pallas_seqs_per_sec, 2)
                    if pallas_seqs_per_sec else None),
            }
        )
    )


if __name__ == "__main__":
    main()
