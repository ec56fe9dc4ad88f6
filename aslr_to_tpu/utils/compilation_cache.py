"""Persistent XLA/Mosaic compilation cache.

Compiles through the tunneled TPU are slow (1-4 min for T=100 solver
graphs; 300-550 s host-side for scan-of-stages lane-homotopy programs).
The persistent cache makes every program a one-time cost per container:
measured 8.4 s -> 0.7 s on a mid-size jit program, and it covers Pallas
kernels too (the Mosaic binary is embedded in the cached XLA executable).

Call :func:`enable` before building solvers in entry points (bench.py,
__graft_entry__.py, scripts). Tests keep the default (no cache): they run
on the emulated CPU mesh where compiles are cheap and cache writes would
only add IO.
"""
from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def enable(cache_dir: str | None = None) -> str:
    """Point JAX at a persistent compilation cache directory (idempotent)."""
    import jax

    path = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR") or DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
