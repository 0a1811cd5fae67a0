from .engine import msm, scalar_mul, tree_sum

__all__ = ["msm", "scalar_mul", "tree_sum"]
