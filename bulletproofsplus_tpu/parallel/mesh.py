"""Device mesh helpers: single-process and multi-host (jax.distributed).

The reference is single-process with no communication backend (SURVEY.md §5);
the TPU-native equivalents are JAX named meshes with XLA collectives — ICI
within a slice, DCN across hosts under `jax.distributed`. Axis convention:
  "dp" — data parallel: independent proofs / batch entries (spans hosts:
         collectives ride DCN only for the final verdict gather)
  "tp" — tensor parallel: one MSM's (scalar, point) pairs split across
         chips (partial-point gather rides ICI within a host/slice)
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def default_mesh(n_devices: int | None = None, dp: int | None = None) -> Mesh:
    """A ("dp", "tp") mesh over the first n_devices devices.

    dp defaults to 1 (whole machine works on one MSM); pass dp>1 to split
    devices between independent proofs and intra-MSM sharding.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    dp = dp or 1
    assert n % dp == 0, "dp must divide device count"
    arr = np.array(devs[:n]).reshape(dp, n // dp)
    return Mesh(arr, ("dp", "tp"))


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Join the multi-host runtime (idempotent).

    Wraps jax.distributed.initialize; arguments default to the standard
    env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID,
    or the cloud-TPU metadata that jax discovers on real pods). After this,
    jax.devices() is GLOBAL (all hosts' chips) while
    jax.local_devices() is this host's — global_mesh() lays dp across
    hosts (DCN) and tp within (ICI).

    MUST be the first JAX call in the process (before anything that
    initializes the backend — jax.devices, device_put, and also
    setup_compilation_cache, which probes the backend)."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as exc:  # idempotence: already initialized
        if "already" not in str(exc).lower():
            raise


def global_mesh(dp: int | None = None) -> Mesh:
    """A ("dp", "tp") mesh over ALL processes' devices, host-major.

    dp defaults to the process count, so each host owns whole dp rows:
    batch-verification proof groups are host-local and only the per-group
    verdict bits cross DCN; the tp axis (MSM pair sharding, an all-gather
    of partial points per group) stays on intra-host ICI. dp must be a
    multiple of the process count for that locality to hold (asserted)."""
    devs = jax.devices()  # global, process-major order
    n = len(devs)
    procs = max(jax.process_count(), 1)
    dp = dp or procs
    assert n % dp == 0, "dp must divide global device count"
    if dp % procs and procs > 1:
        raise ValueError(
            f"dp={dp} must be a multiple of process_count={procs} so dp "
            "rows stay host-local (tp collectives on ICI, not DCN)")
    arr = np.array(devs).reshape(dp, n // dp)
    return Mesh(arr, ("dp", "tp"))


_BARRIER_SEQ = [0]


def distributed_barrier(tag: str, timeout_ms: int = 1_800_000) -> None:
    """Long-deadline coordination-service barrier (no-op single-process).

    Used to line processes up IMMEDIATELY BEFORE executing a cross-process
    program: the Gloo/ICI communicator rendezvous inside program execution
    only waits ~30 s (hardcoded in XLA), while program COMPILES can stagger
    processes by minutes — so the pattern is compile-first (AOT), barrier,
    then execute (see synced_call)."""
    if jax.process_count() <= 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:
        return
    _BARRIER_SEQ[0] += 1
    client.wait_at_barrier(f"bpp_{tag}_{_BARRIER_SEQ[0]}", timeout_ms)


def synced_call(jitted, *args):
    """Execute a jitted cross-process program with compile/execute phases
    separated: compile locally (however long that takes, cache hit or not),
    THEN barrier, THEN run — every process enters the collective rendezvous
    together. Single-process: plain call."""
    if jax.process_count() <= 1:
        return jitted(*args)
    compiled = jitted.lower(*args).compile()
    distributed_barrier("exec")
    return compiled(*args)


def warmup_collectives(mesh: Mesh) -> None:
    """Establish the cross-process collective context NOW with a trivially
    small replicated reduction.

    The Gloo/ICI communicator for a device set is created lazily at the
    first collective and its rendezvous has a ~30 s deadline; if processes
    first meet a collective AFTER minutes of independently-scheduled program
    compiles, a starved peer misses the window (DEADLINE_EXCEEDED on
    GetKeyValue). Running this right after mesh construction — when all
    processes are still in lockstep — creates the context once; every later
    collective reuses it."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    dp, tp = mesh.shape["dp"], mesh.shape["tp"]
    host = np.ones((dp, tp), np.int32)
    from .sharded_msm import _to_global

    x = _to_global(host, mesh, P("dp", "tp"))
    total = synced_call(
        jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P())), x)
    assert int(total) == dp * tp
