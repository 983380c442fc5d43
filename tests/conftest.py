"""Test harness configuration.

* tests run on CPU with 8 virtual devices so the multi-chip sharding path
  is exercised without TPU hardware (SURVEY.md section 4, tier 2); the
  ambient environment points JAX_PLATFORMS at the axon TPU tunnel, which
  is single-client and must not be touched by unit tests;
* float64 is enabled to match the reference's NumPy float64 numerics —
  the analytic parity tolerances assume it.  TPU production runs use
  float32 (see bench.py), which the engine supports via dtype-agnostic
  code paths.

Env vars alone are not enough: pytest plugins (jaxtyping) import jax
before this conftest runs, so the jax.config API is used as well — it is
still effective because no backend has been initialized yet.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# NOTE: do not enable jax_compilation_cache_dir here — persistent-cache
# reads hang on this machine's filesystem (observed: __array__ blocking
# indefinitely on a warm cache entry)

import pytest  # noqa: E402


@pytest.fixture()
def rng():
    import numpy as np

    return np.random.default_rng(42)
