"""Device-mesh construction helpers."""

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(data=None, mc=1, devices=None):
    """Build a (data, mc) mesh.

    ``data=None`` uses all remaining devices on the data axis. The data
    axis is the fastest-varying (innermost) axis so that data-parallel
    psums ride the densest ICI links on real slices.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data is None:
        if n % mc != 0:
            raise ValueError(f"{n} devices not divisible by mc={mc}")
        data = n // mc
    if data * mc > n:
        raise ValueError(f"mesh {data}x{mc} needs {data * mc} devices, "
                         f"have {n}")
    grid = devices[: data * mc].reshape(mc, data)
    return Mesh(grid, axis_names=("mc", "data"))


def local_batch_size(global_batch, mesh):
    """Per-shard batch size on the data axis; validates divisibility."""
    n = mesh.shape["data"]
    if global_batch % n != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by data-parallel "
            f"degree {n}"
        )
    return global_batch // n
