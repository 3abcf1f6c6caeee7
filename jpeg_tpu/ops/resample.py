"""Chroma up/down-sampling (reference frame.c:38-132).

Upsample is nearest-neighbour patch replication with integer steps
(transform_components_to_frame); downsample is a box average over the
step_y x step_x patch (transform_frame_to_components) with the reference's
exact float32 accumulation order (yy outer, xx inner, starting from 0.f).
Steps are always the integer ratios size/c derived from sampling factors,
so both are static reshapes + repeats -- ideal XLA shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def upsample_nn(plane, step_y: int, step_x: int):
    """[h, w] -> [h*step_y, w*step_x] by patch replication."""
    x = jnp.asarray(plane)
    if step_y == 1 and step_x == 1:
        return x
    if step_y != 1:
        x = jnp.repeat(x, step_y, axis=-2)
    if step_x != 1:
        x = jnp.repeat(x, step_x, axis=-1)
    return x


def downsample_box(plane, step_y: int, step_x: int):
    """[h, w] -> [h/step_y, w/step_x] box filter, f32, reference add order."""
    x = jnp.asarray(plane, dtype=jnp.float32)
    if step_y == 1 and step_x == 1:
        return x
    h, w = x.shape[-2], x.shape[-1]
    cy, cx = h // step_y, w // step_x
    patches = x.reshape(*x.shape[:-2], cy, step_y, cx, step_x)
    # Accumulate in the reference's order: yy outer, xx inner, from 0.f.
    acc = jnp.zeros(patches.shape[:-4] + (cy, cx), dtype=jnp.float32)
    for yy in range(step_y):
        for xx in range(step_x):
            acc = acc + patches[..., yy, :, xx]
    return acc / jnp.float32(step_y * step_x)
