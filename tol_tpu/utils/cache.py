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
    (default: ``<repo root>/.jax_cache``), seeding it from the committed
    ``assets/aot_cache`` on first use.  Safe to call repeatedly; raises
    nothing on misconfigured/readonly environments (the cache is an
    optimization, not a requirement) but reports the failure once.

    The seed directory ships the compiled flagship executables (bench
    group/drain programs, mission ensemble programs, graft entry) as
    repo artifacts so a FRESH checkout on the driver machine starts
    solving in seconds instead of recompiling for minutes
    (scratch/build_aot.py regenerates it after solver-code changes; a
    stale seed is harmless — the hash key simply misses).
    """
    import jax

    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if cache_dir is None:
        cache_dir = os.path.join(root, ".jax_cache")
    try:
        seed = os.path.join(root, "assets", "aot_cache")
        if os.path.isdir(seed):
            import shutil

            os.makedirs(cache_dir, exist_ok=True)
            for name in os.listdir(seed):
                dst = os.path.join(cache_dir, name)
                if not os.path.exists(dst):
                    # Atomic publish: concurrent processes (pytest-xdist
                    # workers) race this copy, and a reader must never see
                    # a torn cache entry — stage to a temp file in the
                    # same dir, then os.replace() into place.
                    tmp = dst + f".tmp.{os.getpid()}"
                    shutil.copy2(os.path.join(seed, name), tmp)
                    os.replace(tmp, dst)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover - env-specific
        import warnings

        warnings.warn(f"persistent compile cache unavailable: {e}")
