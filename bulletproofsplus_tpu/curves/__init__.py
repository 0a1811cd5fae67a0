from .edwards import EdwardsOps
from .instances import CURVE_NAMES, base_point, curve_ops, golden_curve
from .weierstrass import WeierstrassOps

__all__ = [
    "CURVE_NAMES",
    "EdwardsOps",
    "WeierstrassOps",
    "base_point",
    "curve_ops",
    "golden_curve",
]
