"""Pencil-decomposed distributed 3-D FFT over a mesh axis.

The TPU-native replacement for scaling the grid beyond one chip's HBM
(SURVEY.md section 5.7): the field (..., Nx, Ny, Nz) is sharded over its
LAST axis; the transform runs

    fft over (x, y) locally
    all_to_all over the mesh axis: reshard z-split -> x-split   (ICI)
    fft over z locally

so each 3-D FFT costs exactly one all_to_all each way.  Designed for use
inside ``shard_map``; the inverse reverses the dance so the output sharding
matches the input.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

# Axis indices within (..., 3, Nx, Ny, Nz) field blocks.
AX_X, AX_Y, AX_Z = -3, -2, -1


def _a2a(x: jnp.ndarray, axis_name: str, split_axis: int, concat_axis: int):
    nd = x.ndim
    return lax.all_to_all(x, axis_name, split_axis % nd, concat_axis % nd,
                          tiled=True)


def pencil_fftn(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Forward 3-D FFT of a z-sharded block (inside shard_map).

    Input:  local shard (..., Nx, Ny, Nz/g), z-sharded.
    Output: local shard (..., Nx/g, Ny, Nz), x-sharded (pencil-transposed).
    """
    x = jnp.fft.fftn(x, axes=(AX_X, AX_Y))
    x = _a2a(x, axis_name, AX_X, AX_Z)      # z gathers, x splits
    return jnp.fft.fft(x, axis=AX_Z)


def pencil_ifftn(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Inverse of :func:`pencil_fftn`: x-sharded in, z-sharded out."""
    x = jnp.fft.ifft(x, axis=AX_Z)
    x = _a2a(x, axis_name, AX_Z, AX_X)      # x gathers, z splits
    return jnp.fft.ifftn(x, axes=(AX_X, AX_Y))
