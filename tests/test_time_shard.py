"""Time-axis sharding (parallel/time_shard.py) vs the sequential smoother
on the virtual 8-device CPU mesh -- the context-parallelism analogue for
the Gaussian chain (SURVEY.md section 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svae_tpu.ops import kalman
from svae_tpu.parallel import make_mesh
from svae_tpu.parallel.time_shard import lds_smoother_timeshard
from tests.test_oracles import make_lds_potentials


def to_jnp(tree):
    return jax.tree.map(jnp.asarray, tree)


@pytest.fixture(scope="module")
def mesh():
    import jax.sharding as shd
    devs = np.array(jax.devices()[:8]).reshape(8)
    return shd.Mesh(devs, ("time",))


@pytest.mark.parametrize("T,d", [(16, 3), (40, 2)])
def test_matches_sequential_smoother(mesh, T, d):
    init, pairs, nodes = make_lds_potentials(T=T, d=d, seed=0,
                                             time_varying=True)
    init, pairs, nodes = to_jnp((init, pairs, nodes))
    want = kalman.lds_smoother(init, pairs, nodes, parallel=False)
    got = lds_smoother_timeshard(init, pairs, nodes, mesh)
    names = ["logZ", "Ex", "ExxT", "Exnxt"]
    for w, g, n in zip(want, got, names):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-8, atol=1e-9, err_msg=n)


def test_indivisible_T_raises(mesh):
    init, pairs, nodes = make_lds_potentials(T=13, d=2, seed=1)
    with pytest.raises(ValueError):
        lds_smoother_timeshard(*to_jnp((init, pairs, nodes)), mesh)


def test_under_jit(mesh):
    init, pairs, nodes = to_jnp(
        make_lds_potentials(T=24, d=3, seed=2, time_varying=True))
    f = jax.jit(lambda i, p, n: lds_smoother_timeshard(i, p, n, mesh))
    got = f(init, pairs, nodes)
    want = kalman.lds_smoother(init, pairs, nodes)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-8, atol=1e-9)
