"""Persistent XLA compilation cache (SURVEY.md §7: first compile of the
flagship programs is ~1 min; every entry point should pay it once per
machine, not once per process)."""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None,
                         min_secs: float = 5) -> None:
    """Idempotently point jax at an on-disk compilation cache.

    ``min_secs`` is the compile-time floor below which programs are not
    cached: entry points keep the default 5 s (only the big programs
    matter), while the test suite passes 1 s — its cost is hundreds of
    small 1-5 s CPU compiles, and caching them cuts repeat suite runs
    on one machine by minutes.
    """
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_secs)
    except Exception:
        pass  # older jax without the knobs: caching is best-effort
