"""Test harness config (SURVEY.md §4).

Tests run on CPU with 8 virtual XLA devices so the data-parallel code path
(mesh + NamedSharding + psum) is exercised without TPU hardware — the
standard JAX distributed-without-a-cluster trick.  Env vars must be set
before jax initializes, hence this conftest sets them at import time.
"""

import os

# Override unconditionally: the session environment pins JAX_PLATFORMS to
# the TPU plugin ("axon"), but the test suite must run on the virtual
# 8-device CPU mesh (bench.py, not tests, exercises the real chip).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The TPU plugin's sitecustomize hook force-updates jax_platforms to
# "axon,cpu" at interpreter boot, ignoring the env var — override the
# config again here, before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
