"""Quantization / dequantization over ``[..., 64]`` coefficient tensors.

Reference semantics (imgproc.c:10-30):
  dequantize: flt = float(int32_coeff * int32_Q)   (integer multiply, then
              a single correctly-rounded int->float conversion)
  quantize:   int = int32(roundf(flt / float(Q)))  (f32 divide, roundf)

Both are elementwise over all blocks of a component -- pure VPU work that
XLA fuses into adjacent stages.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.floatops import roundf


def dequantize(coeffs, qtable):
    """``coeffs`` int32 [..., 64] (raster order), ``qtable`` uint16/int [64]."""
    c = jnp.asarray(coeffs, dtype=jnp.int32)
    q = jnp.asarray(qtable, dtype=jnp.int32)
    return (c * q).astype(jnp.float32)


def quantize(coeffs, qtable):
    """``coeffs`` float32 [..., 64] -> int32, roundf(c / Q) per coefficient."""
    c = jnp.asarray(coeffs, dtype=jnp.float32)
    q = jnp.asarray(qtable, dtype=jnp.int32).astype(jnp.float32)
    return roundf(c / q).astype(jnp.int32)
