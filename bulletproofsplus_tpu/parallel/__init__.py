from .mesh import (
    default_mesh,
    distributed_barrier,
    global_mesh,
    init_distributed,
    synced_call,
    warmup_collectives,
)
from .sharded_msm import sharded_fixed_msm, sharded_msm, sharded_msm_rows
from .sharded_prover import sharded_prove

__all__ = [
    "sharded_prove",
    "default_mesh",
    "global_mesh",
    "distributed_barrier",
    "init_distributed",
    "synced_call",
    "warmup_collectives",
    "sharded_fixed_msm",
    "sharded_msm",
    "sharded_msm_rows",
]
