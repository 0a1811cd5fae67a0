"""Device mesh helpers.

The reference is single-process with no communication backend (SURVEY.md §5);
the TPU-native equivalents are JAX named meshes with XLA collectives over
ICI/DCN. Axis convention:
  "dp" — data parallel: independent proofs / batch entries
  "tp" — tensor parallel: one MSM's (scalar, point) pairs split across chips
"""
from __future__ import annotations

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
