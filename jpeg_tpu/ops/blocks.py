"""Block <-> planar raster reshapes (reference imgproc.c:233-293).

The reference scatters each 8x8 block into a per-component planar raster
with four nested loops; on TPU this is a pure layout transform --
reshape/transpose that XLA folds into neighbouring kernels for free.
"""

from __future__ import annotations

import jax.numpy as jnp


def blocks_to_plane(blocks, b_y: int, b_x: int):
    """[b_y*b_x, 8, 8] blocks (raster block order) -> [b_y*8, b_x*8] plane."""
    x = jnp.asarray(blocks).reshape(b_y, b_x, 8, 8)
    return x.transpose(0, 2, 1, 3).reshape(b_y * 8, b_x * 8)


def plane_to_blocks(plane, b_y: int, b_x: int):
    """[b_y*8, b_x*8] plane -> [b_y*b_x, 8, 8] blocks (raster block order)."""
    x = jnp.asarray(plane).reshape(b_y, 8, b_x, 8)
    return x.transpose(0, 2, 1, 3).reshape(b_y * b_x, 8, 8)
