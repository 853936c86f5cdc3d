"""Persistent XLA compile-cache setup (shared by every entry point).

The flagship solver programs are minutes-long XLA compiles through the
remote TPU compile helper; the on-disk cache replays them in seconds on
any rerun with identical program structure.  bench.py, bench_scaling.py
and __graft_entry__.py all call :func:`enable_compile_cache` with the
same settings so cache admission behavior is identical regardless of
which entry point compiled first.
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Point JAX's persistent compilation cache at ``cache_dir``
    (default: ``<repo root>/.jax_cache``).  Safe to call repeatedly;
    raises nothing on misconfigured/readonly environments (the cache is
    an optimization, not a requirement) but reports the failure once."""
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover - env-specific
        import warnings

        warnings.warn(f"persistent compile cache unavailable: {e}")
