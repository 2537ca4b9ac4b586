"""Test harness config (SURVEY.md §4).

Tests run on CPU with 8 virtual XLA devices so the data-parallel code path
(mesh + NamedSharding + psum) is exercised without TPU hardware — the
standard JAX distributed-without-a-cluster trick.  Env vars must be set
before jax initializes, hence this conftest sets them at import time.
"""

import os
import sys

# Repo root on sys.path: `python -m pytest` adds the cwd, but the
# `pytest` console script does not — without this, cross-test imports
# (tests.test_convert) and `import __graft_entry__` fail at collection.
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

# Tests run on the virtual 8-device CPU mesh (bench.py, not tests,
# exercises the real chip); the shared helper also overrides the TPU
# plugin's sitecustomize jax_platforms pin.
from pesr_tpu.parallel import force_cpu_devices  # noqa: E402
from pesr_tpu.utils.cache import enable_compile_cache  # noqa: E402

force_cpu_devices(8)

# Persistent XLA compile cache for the suite: the single-core harness
# spends most of its wall-clock on hundreds of small CPU compiles, and
# they are identical run-to-run.  min_secs=1 (vs the entry points' 5)
# because the suite's cost is exactly those 1-5 s programs.  Opt out
# with PESR_TEST_NO_CACHE=1 to measure cold-compile times.
if not os.environ.get("PESR_TEST_NO_CACHE"):
    enable_compile_cache(min_secs=1)

# Items deselected by marker filters (the default `-m 'not slow'`
# addopts): recorded so tests/test_docs_fresh.py can reconstruct the
# FULL collection (selected + deselected) and check the README's test
# counts against reality — the counts went stale three rounds running
# when maintained by hand (round-4 verdict weak #1 / next #6).
DESELECTED = []


def pytest_deselected(items):
    DESELECTED.extend(items)
