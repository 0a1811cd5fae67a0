"""Persistent XLA compilation cache setup.

The limb-arithmetic graphs are large and the op shapes are canonicalized
(powers of two), so compilations are highly reusable across processes; the
persistent cache turns the first-run compile cost into a one-time cost per
machine. Call setup_compilation_cache() before the first jitted call.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def setup_compilation_cache(path: str | None = None) -> None:
    """Opt-in via BPP_JAX_CACHE=1: this machine's XLA:CPU segfaults
    intermittently inside executable.serialize() during persistent-cache
    writes (observed in compilation_cache.put_executable_and_time), so the
    persistent cache is disabled unless explicitly requested."""
    if os.environ.get("BPP_JAX_CACHE", "0") != "1":
        return
    import jax

    path = path or os.environ.get("BPP_JAX_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_raise_persistent_cache_errors", False)
    except Exception:
        pass  # older jax without these flags: in-memory cache only
