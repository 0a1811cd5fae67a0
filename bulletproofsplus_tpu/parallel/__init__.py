from .mesh import default_mesh
from .sharded_msm import sharded_fixed_msm, sharded_msm, sharded_msm_rows

__all__ = [
    "default_mesh",
    "sharded_fixed_msm",
    "sharded_msm",
    "sharded_msm_rows",
]
