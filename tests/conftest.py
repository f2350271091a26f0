"""Test configuration: force CPU with a virtual 8-device mesh (so the
data-parallel / psum paths run without a pod -- SURVEY.md section 4) and
enable float64 so JAX results can be compared tightly against the NumPy f64
sequential oracles. Must run before the first `import jax` anywhere."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize force-registers the TPU backend and overrides
# jax_platforms at interpreter start; re-override after import (backends are
# initialized lazily, so this still wins).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: cuts repeat suite runs from minutes of
# XLA:CPU compiles to seconds.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
