"""Device mesh construction for the mask x target pair grid.

The reference scales out by statically block-partitioning the pair grid
over an LSF job array (scripts/submitCDSBatch.sh:10-36, job index ->
(maskBlock, targetBlock)). Here the mesh IS that grid: a 2-D
jax.sharding.Mesh with axes ("mask", "target"); each device owns a
static block of the pair matrix, and per-mask reductions (score maxima
for normalization) ride ICI collectives over the "target" axis.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def _factor_grid(n: int) -> Tuple[int, int]:
    """Squarest (mask, target) factorization of n devices."""
    best = (1, n)
    for m in range(1, int(np.sqrt(n)) + 1):
        if n % m == 0:
            best = (m, n // m)
    return best


def make_pair_mesh(devices: Optional[Sequence] = None,
                   shape: Optional[Tuple[int, int]] = None) -> Mesh:
    """Build a ("mask", "target") mesh over the given devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = _factor_grid(n)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, ("mask", "target"))
