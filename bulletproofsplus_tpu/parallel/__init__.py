from .mesh import default_mesh, global_mesh, init_distributed
from .sharded_msm import sharded_fixed_msm, sharded_msm, sharded_msm_rows

__all__ = [
    "default_mesh",
    "global_mesh",
    "init_distributed",
    "sharded_fixed_msm",
    "sharded_msm",
    "sharded_msm_rows",
]
