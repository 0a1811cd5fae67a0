"""MSM sharded across a device mesh.

The intra-MSM axis is embarrassingly parallel until the final combine: each
device reduces its own (scalar, point) slice to one partial point, and the
ndev partial points are gathered and tree-summed (log2(ndev) adds). This is
the "tensor parallel" analogue for this domain (SURVEY.md §2 parallelism
inventory): the pair axis is the sharded dimension, the collective is an
all-gather of C·L-limb partials over ICI.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..msm.engine import _msm_jit, _next_pow2, tree_sum


def _to_global(arr, mesh: Mesh, spec: P):
    """Place an array on a (possibly multi-process) mesh sharding.

    Single-process: plain device_put. Multi-process (jax.distributed):
    every process holds the SAME host value (the protocol's inputs are
    replicated host-side), so each contributes its addressable shards via
    make_array_from_callback — the supported way to build a global array
    whose sharding spans non-addressable devices.""" 
    import numpy as _np

    sh = NamedSharding(mesh, spec)
    if jax.process_count() > 1:
        host = _np.asarray(arr)
        return jax.make_array_from_callback(
            host.shape, sh, lambda idx: host[idx])
    return jax.device_put(arr, sh)


def replicated_all_identity(curve, expected, mesh: Mesh) -> bool:
    """jnp.all(is_identity(expected)) with a REPLICATED output over the
    mesh — on a multi-process mesh the plain reduction's output would not
    be fully addressable and bool() would fail; forcing replication emits
    the cross-host all-gather instead (compile-barrier-execute via
    synced_call so the collective rendezvous is aligned)."""
    from .mesh import synced_call

    f = jax.jit(
        lambda e: jnp.all(curve.is_identity(e)),
        out_shardings=NamedSharding(mesh, P()),
    )
    return bool(synced_call(f, expected))


@functools.lru_cache(maxsize=None)
def _sharded_msm_jit(curve, nbits: int, mesh: Mesh, axis: str):
    local = _msm_jit(curve, nbits)

    def per_device(scalars, points):
        # scalars: (N/ndev, Ls), points: (N/ndev, C, L) — local shard
        return local(scalars, points)[None]  # (1, C, L)

    shard = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None, None)),
        out_specs=P(axis, None, None),
        check_vma=False,
    )

    def f(scalars, points):
        partials = shard(scalars, points)  # (ndev, C, L)
        n = partials.shape[0]
        while n > 1:
            partials = curve.add(partials[: n // 2], partials[n // 2 :])
            n //= 2
        return partials[0]

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _sharded_msm_rows_jit(curve, nbits: int, mesh: Mesh):
    local = _msm_jit(curve, nbits)

    def per_device(scalars, points):
        # scalars: (B/dp, N/tp, Ls); points: (B/dp, N/tp, C, L)
        return local(scalars, points)[:, None]  # (B/dp, 1, C, L)

    shard = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P("dp", "tp", None), P("dp", "tp", None, None)),
        out_specs=P("dp", "tp", None, None),
        check_vma=False,
    )

    def f(scalars, points):
        partials = shard(scalars, points)  # (B, tp, C, L)
        n = partials.shape[1]
        while n > 1:
            partials = curve.add(partials[:, : n // 2], partials[:, n // 2:])
            n //= 2
        return partials[:, 0]  # (B, C, L)

    return jax.jit(f)


def sharded_msm_rows(curve, scalars, points, mesh: Mesh,
                     nbits: int | None = None):
    """B independent MSMs over a ("dp", "tp") mesh: row b's pairs live on
    mesh row b mod dp, sharded over tp; returns (B, C, L) results.

    The DP analogue for this domain (SURVEY.md §2 parallelism inventory):
    independent proof groups over dp, one group's mega-MSM pairs over tp.
    Rows pad to a dp multiple with zero-scalar rows (their MSM is the
    identity); the pair axis pads per sharded_msm."""
    nbits = nbits or curve.fn.order_bits
    dp, tp = mesh.shape["dp"], mesh.shape["tp"]
    B, n = points.shape[0], points.shape[1]
    per = _next_pow2(-(-n // tp))
    total = per * tp
    Bp = -(-B // dp) * dp
    if total != n or Bp != B:
        # pads allocate in the inputs' own dtypes (int64 limb lanes on CPU):
        # a cross-dtype .at[].set raises on future JAX versions
        sc = jnp.zeros((Bp, total, scalars.shape[-1]), scalars.dtype)
        scalars = sc.at[:B, :n].set(scalars)
        pp = jnp.broadcast_to(
            jnp.asarray(curve.identity_np).astype(points.dtype),
            (Bp, total, *points.shape[-2:]),
        )
        points = pp.at[:B, :n].set(points)
    scalars = _to_global(scalars, mesh, P("dp", "tp", None))
    points = _to_global(points, mesh, P("dp", "tp", None, None))
    from .mesh import synced_call

    return synced_call(
        _sharded_msm_rows_jit(curve, nbits, mesh), scalars, points)[:B]


@functools.lru_cache(maxsize=None)
def _sharded_fixed_msm_jit(curve, nbits: int, mesh: Mesh, axis: str,
                           signed: bool = False):
    from ..msm.fixed import _fixed_msm_jit, _fixed_msm_signed_jit

    local = (_fixed_msm_signed_jit(curve, nbits) if signed
             else _fixed_msm_jit(curve, nbits))

    def per_device(scalars, table):
        # scalars: (N/ndev, Ls); table: (2^c, nwin, N/ndev, C, L)
        return local(scalars, table)[None]  # (1, C, L)

    shard = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis, None), P(None, None, axis, None, None)),
        out_specs=P(axis, None, None),
        check_vma=False,
    )

    def f(scalars, table):
        partials = shard(scalars, table)  # (ndev, C, L)
        n = partials.shape[0]
        while n > 1:
            partials = curve.add(partials[: n // 2], partials[n // 2 :])
            n //= 2
        return partials[0]

    return jax.jit(f)


def sharded_fixed_msm(curve, scalars, table, mesh: Mesh, axis: str = "tp",
                      nbits: int | None = None):
    """Fixed-base MSM (msm/fixed.py) with the table's base-point axis sharded
    over mesh[axis]: each device looks up + tree-adds its own generator
    slice, the ndev partials combine with log2(ndev) point adds. The fixed
    lanes' N is the pk generator count (a power of two for power-of-two mn),
    so the axis must divide N evenly — callers pad the pk, not this fn."""
    nbits = nbits or curve.fn.order_bits
    ndev = mesh.shape[axis]
    if table.shape[2] % ndev or scalars.shape[0] != table.shape[2]:
        raise ValueError("table point axis must divide the mesh axis")
    from ..msm.fixed import WINDOW as _C

    signed = table.shape[0] == (1 << (_C - 1))
    scalars = _to_global(scalars, mesh, P(axis, None))
    table = _to_global(table, mesh, P(None, None, axis, None, None))
    from .mesh import synced_call

    return synced_call(
        _sharded_fixed_msm_jit(curve, nbits, mesh, axis, signed),
        scalars, table)


def sharded_msm(curve, scalars, points, mesh: Mesh, axis: str = "tp",
                nbits: int | None = None):
    """Σ scalars[i]·points[i] with the pair axis sharded over mesh[axis].

    Pads N to ndev × 2^k (zero scalars / identity points), shards the pair
    axis, computes one partial MSM per device, and combines the ndev partials
    with a log-depth tree of point adds.
    """
    nbits = nbits or curve.fn.order_bits
    ndev = mesh.shape[axis]
    n = points.shape[0]
    per = _next_pow2(-(-n // ndev))
    total = per * ndev
    if total != n:
        scalars = jnp.concatenate(
            [scalars, jnp.zeros((total - n, scalars.shape[-1]), jnp.int32)], axis=0
        )
        points = jnp.concatenate(
            [points, curve.identity_like((total - n,))], axis=0
        )
    scalars = _to_global(scalars, mesh, P(axis, None))
    points = _to_global(points, mesh, P(axis, None, None))
    from .mesh import synced_call

    return synced_call(
        _sharded_msm_jit(curve, nbits, mesh, axis), scalars, points)
