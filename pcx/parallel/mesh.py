"""Device-mesh helpers for the two parallel axes of the workload.

The reference is single-GPU (SURVEY.md section 2.4); pcx scales along:

* "k"    — the Brillouin-zone sweep: k-points are independent solves
           (the reference's serial loop, numerical_experiments.py:418),
* "grid" — the FFT grid for N beyond one chip's HBM: pencil-decomposed
           3-D FFT + local symbol multiplies; Gram reductions psum.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, PartitionSpec as P

K_AXIS = "k"
GRID_AXIS = "grid"


def make_mesh(n_k: Optional[int] = None, n_grid: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh over ("k", "grid").  Defaults: all grid if n_grid given, else
    split devices evenly preferring the k axis (independent solves scale
    perfectly; grid sharding pays all_to_all)."""
    devices = list(devices if devices is not None else jax.devices())
    n_dev = len(devices)
    if n_k is None and n_grid is None:
        n_k, n_grid = n_dev, 1
    elif n_k is None:
        n_k = n_dev // n_grid
    elif n_grid is None:
        n_grid = n_dev // n_k
    if n_k * n_grid != n_dev:
        raise ValueError(f"mesh {n_k}x{n_grid} != {n_dev} devices")
    arr = np.asarray(devices).reshape(n_k, n_grid)
    return Mesh(arr, (K_AXIS, GRID_AXIS))


def field_spec(batched: bool = False) -> P:
    """PartitionSpec of a field block (m, 3, N, N, N): shard the LAST grid
    axis over "grid" (pencil layout); optionally a leading k-batch axis."""
    if batched:
        return P(K_AXIS, None, None, None, None, GRID_AXIS)
    return P(None, None, None, None, GRID_AXIS)


def symbol_spec(batched: bool = False) -> P:
    """PartitionSpec of a symbol (3, N, N, N) (same grid sharding)."""
    if batched:
        return P(K_AXIS, None, None, None, GRID_AXIS)
    return P(None, None, None, GRID_AXIS)
