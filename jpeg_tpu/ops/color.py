"""Color space conversions over ``[..., C]`` pixel tensors.

Reference semantics (frame.c:154-244): the C source writes the BT.601
coefficients as double literals, so multiplies/adds involving them happen in
double precision, BUT sub-expressions between float lvalues stay in float32:

  decode   (Cb - shift), (Cr - shift)        -> float32 subtraction
           Y + 1.402 * (...)                 -> double, stored to float32
  YCCK     R = K - (C * K) / denom           -> entirely float32
  encode   0.299 * R + ... (+ shift)         -> entirely double, stored f32

``exact=True`` reproduces this mixed-precision dance bit-for-bit (requires
jax_enable_x64, which the package enables); ``exact=False`` keeps everything
float32 for TPU throughput (differs by at most ~1 ulp).

Grayscale (C=1) passes through untouched, like the reference ``case 1``.
"""

from __future__ import annotations

import jax.numpy as jnp


def _work_dtype(exact: bool):
    return jnp.float64 if exact else jnp.float32


def rgb_to_ycc(pixels, precision: int, exact: bool = True):
    """RGB -> YCbCr (frame.c:154-186).  ``pixels`` [..., 3] float32."""
    x = jnp.asarray(pixels)
    if x.shape[-1] == 1:
        return x
    dt = _work_dtype(exact)
    shift = float(1 << (precision - 1))
    r = x[..., 0].astype(dt)
    g = x[..., 1].astype(dt)
    b = x[..., 2].astype(dt)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.1687 * r - 0.3313 * g + 0.5 * b + shift
    cr = 0.5 * r - 0.4187 * g - 0.0813 * b + shift
    return jnp.stack(
        [y.astype(jnp.float32), cb.astype(jnp.float32), cr.astype(jnp.float32)],
        axis=-1,
    )


def _centered_f32(chan, precision: int):
    """float32 ``chan - (1 << (P-1))`` as the C sub-expression computes it."""
    shift = jnp.float32(1 << (precision - 1))
    return chan.astype(jnp.float32) - shift


def ycc_to_rgb(pixels, precision: int, exact: bool = True):
    """YCbCr -> RGB (frame.c:219-235).  ``pixels`` [..., 3] float32."""
    x = jnp.asarray(pixels)
    if x.shape[-1] == 1:
        return x
    dt = _work_dtype(exact)
    y = x[..., 0].astype(dt)
    cb = _centered_f32(x[..., 1], precision).astype(dt)
    cr = _centered_f32(x[..., 2], precision).astype(dt)
    r = y + 1.402 * cr
    g = y - 0.34414 * cb - 0.71414 * cr
    b = y + 1.772 * cb
    return jnp.stack(
        [r.astype(jnp.float32), g.astype(jnp.float32), b.astype(jnp.float32)],
        axis=-1,
    )


def ycc_to_rgb_planar(y, cb, cr, precision: int, exact: bool = False):
    """Planar YCbCr -> (r, g, b) planes, same math as ``ycc_to_rgb``.

    TPU layout note: interleaving channels into a [..., 3] minor axis is
    a pathological transpose (3 never fills the 128-lane dimension) --
    measured ~30 ms per 8x1080p batch just for the f32 stack.  The
    device decode path stays planar through the color math and
    interleaves only the final uint8 samples.
    """
    dt = _work_dtype(exact)
    yv = jnp.asarray(y).astype(dt)
    cbv = _centered_f32(jnp.asarray(cb), precision).astype(dt)
    crv = _centered_f32(jnp.asarray(cr), precision).astype(dt)
    r = yv + 1.402 * crv
    g = yv - 0.34414 * cbv - 0.71414 * crv
    b = yv + 1.772 * cbv
    return (
        r.astype(jnp.float32),
        g.astype(jnp.float32),
        b.astype(jnp.float32),
    )


def ycck_to_rgb(pixels, precision: int, exact: bool = True):
    """YCCK (Adobe 4-component) -> RGB via CMYK inversion (frame.c:196-218).

    The intermediate C/M/Y values are double-precision expressions stored to
    float32; the final ``K - (C*K)/denom`` inversion is pure float32 in the
    reference.  Returns [..., 4] with the K channel set to 255.
    """
    x = jnp.asarray(pixels)
    dt = _work_dtype(exact)
    denom = jnp.float32(1 << precision)
    y_ = x[..., 0].astype(dt)
    cb = _centered_f32(x[..., 1], precision).astype(dt)
    cr = _centered_f32(x[..., 2], precision).astype(dt)
    k = x[..., 3].astype(jnp.float32)

    c = (y_ + 1.402 * cr).astype(jnp.float32)
    m = (y_ - 0.34414 * cb - 0.71414 * cr).astype(jnp.float32)
    yy = (y_ + 1.772 * cb).astype(jnp.float32)

    r = k - (c * k) / denom
    g = k - (m * k) / denom
    b = k - (yy * k) / denom
    kk = jnp.full_like(r, 255.0)
    return jnp.stack([r, g, b, kk], axis=-1)


def to_rgb(pixels, precision: int, exact: bool = True):
    """Dispatch on component count like frame_to_rgb (frame.c:188-244)."""
    n = pixels.shape[-1]
    if n == 4:
        return ycck_to_rgb(pixels, precision, exact)
    if n == 3:
        return ycc_to_rgb(pixels, precision, exact)
    if n == 1:
        return jnp.asarray(pixels)
    raise ValueError(f"unsupported component count {n}")
