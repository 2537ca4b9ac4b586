"""Single-tenant TPU acquisition helper (dev-harness specific).

This session's TPU is reached through a relay that grants the chip to
one process at a time.  A process that starts while the previous
holder's lease is draining fails PJRT init, and the plugin's connection
state is a process-level OnceLock — the failure is unrecoverable
IN-PROCESS ("Restart the process to change connection parameters").

``acquire_tpu()`` therefore re-execs the current process (same argv/env)
after a backoff when the backend is unavailable, up to a bounded number
of attempts tracked via an env var.  Call it FIRST, before any other
jax use.  Production TPU hosts don't hit this path: the first
``jax.devices()`` simply succeeds and this is a no-op.
"""

from __future__ import annotations

import os
import sys
import time

_ATTEMPT_VAR = "PESR_TPU_LEASE_ATTEMPT"


def acquire_tpu(max_attempts: int = 12, backoff_s: float = 25.0):
    """Return jax.devices(), re-execing this process until the TPU
    lease is granted (bounded attempts)."""
    import jax

    try:
        devices = jax.devices()
        if (devices and devices[0].platform == "cpu"
                and not os.environ.get("PESR_ALLOW_CPU_BENCH")):
            # The sitecustomize pins jax_platforms to "axon,cpu": a
            # failed axon init (previous holder's lease still
            # draining) does NOT raise — jax silently falls back to
            # CPU and a "TPU" benchmark then measures host cores.
            # Treat the fallback as busy and retry like the error
            # path below.  On a genuinely CPU-only machine set
            # PESR_ALLOW_CPU_BENCH=1 to run anyway (numbers will be
            # labeled by the caller's device fields, not silently
            # wrong).
            raise RuntimeError(
                "axon backend unavailable (jax fell back to cpu)")
        # Clear the retry counter on success: child processes (e.g.
        # benchmarks/run.py config4 spawning bench.py) must start their
        # own attempt budget, not inherit an exhausted one.
        os.environ.pop(_ATTEMPT_VAR, None)
        return devices
    except RuntimeError as e:
        attempt = int(os.environ.get(_ATTEMPT_VAR, "0"))
        if attempt + 1 >= max_attempts:
            raise RuntimeError(
                f"TPU lease not acquired after {max_attempts} process "
                f"restarts: {e}") from e
        os.environ[_ATTEMPT_VAR] = str(attempt + 1)
        print(f"[tpu_lease] backend busy (attempt {attempt + 1}/"
              f"{max_attempts}); re-exec in {backoff_s:.0f}s",
              file=sys.stderr, flush=True)
        time.sleep(backoff_s)
        os.execv(sys.executable, [sys.executable] + sys.argv)
