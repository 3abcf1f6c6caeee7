"""Float helpers that replicate C libm semantics bit-for-bit."""

from __future__ import annotations

import jax.numpy as jnp


def roundf(x):
    """C99 ``roundf``: round to nearest, ties AWAY from zero.

    ``jnp.round`` rounds ties to even, which diverges from the reference's
    quantizer (imgproc.c:28 ``roundf(flt / Q)``) and PNM writer
    (frame.c:375/385) on exact .5 values, so we emulate via trunc + exact
    fraction comparison.  ``x - trunc(x)`` is exact in float (Sterbenz),
    and values >= 2**23 are already integral, so this matches roundf for
    every float32 input.
    """
    x = jnp.asarray(x)
    t = jnp.trunc(x)
    frac = x - t
    bump = jnp.where(x >= 0, jnp.asarray(1, x.dtype), jnp.asarray(-1, x.dtype))
    return jnp.where(jnp.abs(frac) >= jnp.asarray(0.5, x.dtype), t + bump, t)
