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
    """On by default for both TPU and CPU (disable via BPP_JAX_CACHE=0).

    Set XLA_FLAGS BEFORE calling this (as tests/conftest.py and
    __graft_entry__.py do): the call initializes the JAX backend and
    snapshots the ISA tag from XLA_FLAGS at that moment — flags changed
    afterwards would not affect codegen but WOULD desynchronize the cache
    partition from the executables actually produced.

    CPU caching requires codegen restricted to features the machine actually
    executes — tests/conftest.py forces --xla_cpu_max_isa=AVX2 because this
    VM's CPUID over-reports AVX-512 subsets; with that restriction cache
    entries round-trip cleanly (measured: 77 s cold → 17 s warm for the MSM
    program). TPU executables save ~40 s per program per cold process."""
    import jax

    if os.environ.get("BPP_JAX_CACHE") == "0":
        return

    path = path or os.environ.get("BPP_JAX_CACHE_DIR", _DEFAULT_DIR)
    # The CPU ISA pin lives in the XLA_FLAGS env var, which is NOT part of
    # jax's cache key — a pinned process can deserialize an executable that
    # was codegen'd unpinned (AVX-512 on this VM) and segfault inside
    # cache_read. Partition CPU entries by ISA tag; TPU keeps the root dir.
    # The platform is read from jax_platforms config / env WITHOUT touching
    # jax.default_backend(): probing would initialize the XLA backend, and
    # this function runs at package import — before a multi-host process
    # has had the chance to call jax.distributed.initialize() (which must
    # be the first backend-initializing call).
    plats = ""
    try:
        plats = jax.config.jax_platforms or ""
    except Exception:
        pass
    plats = plats or os.environ.get("JAX_PLATFORMS", "")
    isa = None
    for tok in os.environ.get("XLA_FLAGS", "").split():
        if tok.startswith("--xla_cpu_max_isa="):
            isa = tok.split("=", 1)[1].lower()
    # Only the PRIMARY (first) platform decides the partition: accelerator
    # registration appends cpu as a fallback entry ("axon,cpu" on this
    # machine), and substring-matching "cpu" there routed every TPU process
    # into the CPU partition — splitting the TPU cache from the root dir
    # other TPU processes read. An unset platform (the common
    # library-import case) with an ISA pin in XLA_FLAGS means a CPU run:
    # classify it as such so pinned and unpinned CPU processes never share
    # a partition (the deserialize-segfault scenario the partition exists
    # to prevent).
    primary = plats.split(",")[0].strip().lower() if plats else ""
    # ANY process with an ISA pin goes to the pinned partition — even an
    # accelerator-primary one: such a process can still compile CPU-backend
    # executables (the appended cpu fallback, explicit device=cpu), and
    # writing those pinned entries into the shared root would recreate the
    # ISA-mix deserialize-segfault this partitioning exists to prevent. The
    # cost is only less sharing (its TPU entries land in the pinned
    # partition too).
    backend = "cpu" if (primary == "cpu" or isa) else "accel"
    if backend == "cpu":
        path = os.path.join(path, f"cpu-{isa or 'native'}")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_raise_persistent_cache_errors", False)
    except Exception:
        pass  # older jax without these flags: in-memory cache only
