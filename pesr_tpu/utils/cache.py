"""Persistent XLA compilation cache (SURVEY.md §7: first compile of the
flagship programs is ~1 min; every entry point should pay it once per
machine, not once per process)."""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Idempotently point jax at an on-disk compilation cache."""
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass  # older jax without the knobs: caching is best-effort
