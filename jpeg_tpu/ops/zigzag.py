"""Zig-zag permutation helpers over ``[..., 64]`` coefficient vectors."""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import INV_ZIGZAG, ZIGZAG


def zigzag_to_raster(vec):
    """Reorder a zig-zag-ordered [..., 64] vector into raster order.

    out[raster_pos] = in[zigzag_pos]: out = scatter via ZIGZAG, i.e. a
    gather with INV_ZIGZAG.
    """
    return jnp.asarray(vec)[..., INV_ZIGZAG]


def raster_to_zigzag(vec):
    """Reorder a raster-ordered [..., 64] vector into zig-zag order."""
    return jnp.asarray(vec)[..., ZIGZAG]
