"""Test harness configuration.

Tests run on CPU with float64 enabled (the oracle precision) and an
8-device virtual platform so multi-chip sharding tests exercise real
``jax.sharding.Mesh`` collectives without TPU hardware.

Note: pytest plugins import jax before this conftest runs, so platform
selection must go through ``jax.config`` (effective until backend init)
rather than environment variables.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compile cache: the expensive tests are XLA-compile-bound
# (dense-vs-structured KKT parity programs, solver while-loops); on a
# machine that has run the suite before, identical programs replay from
# disk and the suite wall time drops severalfold.
from tol_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()
