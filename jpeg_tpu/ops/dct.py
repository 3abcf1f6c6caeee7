"""8x8 DCT-II/DCT-III kernels, batched over ``[..., 8, 8]`` blocks.

Two implementations with identical math but different numerics:

* ``idct8x8_exact`` / ``fdct8x8_exact`` -- separable 1-D passes with the
  summation fully unrolled in ascending-tap order, all in float32.  This is
  bit-identical to the reference's naive LUT DCT (imgproc.c:84-170 built
  with strict IEEE fp, no FMA contraction): XLA does not reassociate or
  contract float arithmetic, so each multiply and add rounds exactly like
  the C code's ``s += in[u] * lut[x][u]`` loop.

* ``idct8x8_matmul`` / ``fdct8x8_matmul`` -- the TPU-native form
  ``A @ X @ A^T`` executed on the MXU as two batched [*,8,8]x[8,8] matmuls.
  Not bit-identical (different accumulation order) but within ~1e-4, which
  the fast pipeline uses for throughput.

The cosine LUT reproduces the reference's float path exactly
(imgproc.c:84-102): the angle is computed in double, rounded to float32,
and the correctly-rounded cosine of that float32 is taken (glibc's cosf is
correctly rounded for these arguments; validated bit-for-bit in tests).
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def dct_lut_f32() -> np.ndarray:
    """A[x, u] = 0.5 * C(u) * cos((2x+1) u pi / 16) in float32.

    Matches the reference LUT (imgproc.c:95-102) bit-for-bit.
    """
    lut = np.zeros((8, 8), dtype=np.float32)
    half = np.float32(0.5)
    c0 = np.float32(1.0) / np.sqrt(np.float32(2.0))
    for x in range(8):
        for u in range(8):
            arg = np.float32((2 * x + 1) * u * math.pi / 16)
            cos = np.float32(np.cos(np.float64(arg)))
            scale = np.float32(half * (c0 if u == 0 else np.float32(1.0)))
            lut[x, u] = np.float32(scale * cos)
    return lut


def _contract_last_exact(x, mat: np.ndarray):
    """out[..., i] = sum_k x[..., k] * mat[i, k], ascending k, f32 order.

    IMPORTANT: bit-exactness holds only in EAGER execution.  Inside a
    jitted fusion, XLA:CPU's LLVM backend contracts mul+add chains into
    FMAs (single rounding), diverging from the reference's strict-IEEE
    build; neither optimization_barrier nor bitcast round-trips block
    the contraction.  The exact pipelines therefore run unjitted
    (api._maybe_jit), where each op is its own executable and rounds
    separately.  The fast (jitted, MXU) path uses the matmul kernels.
    """
    cols = []
    for i in range(8):
        s = x[..., 0] * mat[i, 0]
        for k in range(1, 8):
            s = s + x[..., k] * mat[i, k]
        cols.append(s)
    return jnp.stack(cols, axis=-1)


def idct8x8_exact(blocks):
    """Inverse DCT, rows then columns (imgproc.c:130-149), f32 bit-exact."""
    a = dct_lut_f32()
    blocks = jnp.asarray(blocks, dtype=jnp.float32)
    # Row pass: out[..., y, x] = sum_u in[..., y, u] * A[x, u]
    rows = _contract_last_exact(blocks, a)
    # Column pass: out[..., y, x] = sum_v rows[..., v, x] * A[y, v]
    cols = _contract_last_exact(jnp.swapaxes(rows, -1, -2), a)
    return jnp.swapaxes(cols, -1, -2)


def fdct8x8_exact(blocks):
    """Forward DCT, rows then columns (imgproc.c:151-170), f32 bit-exact."""
    a = dct_lut_f32()
    at = np.ascontiguousarray(a.T)  # out[u] = sum_x in[x] * A[x, u]
    blocks = jnp.asarray(blocks, dtype=jnp.float32)
    rows = _contract_last_exact(blocks, at)
    cols = _contract_last_exact(jnp.swapaxes(rows, -1, -2), at)
    return jnp.swapaxes(cols, -1, -2)


@lru_cache(maxsize=None)
def _kron_mats():
    """[64, 64] flattened-DCT operators: vec(out) = vec(in) @ M.

    The separable 2-D DCT A X A^T (resp. A^T X A) is one matmul on
    raster-flattened blocks with the Kronecker matrix -- the MXU-native
    form: [n_blocks, 64] @ [64, 64] tiles the 128x128 systolic array far
    better than batched 8x8 einsums.
    """
    a = dct_lut_f32().astype(np.float64)
    m_idct = np.kron(a.T, a.T).astype(np.float32)  # in (u,v) -> out (y,x)
    m_fdct = np.kron(a, a).astype(np.float32)  # in (y,x) -> out (u,v)
    return m_idct, m_fdct


def idct8x8_kron(flat, dtype=jnp.float32, precision="highest"):
    """IDCT on raster-flattened [..., 64] blocks via one MXU matmul."""
    m = jnp.asarray(_kron_mats()[0], dtype=dtype)
    x = jnp.asarray(flat, dtype=dtype)
    return jnp.matmul(x, m, precision=precision, preferred_element_type=dtype)


def fdct8x8_kron(flat, dtype=jnp.float32, precision="highest"):
    """FDCT on raster-flattened [..., 64] blocks via one MXU matmul."""
    m = jnp.asarray(_kron_mats()[1], dtype=dtype)
    x = jnp.asarray(flat, dtype=dtype)
    return jnp.matmul(x, m, precision=precision, preferred_element_type=dtype)


def idct8x8_matmul(blocks, dtype=jnp.float32, precision="highest"):
    """MXU form: IDCT2(X) = A @ X @ A^T.

    ``precision="highest"`` keeps true f32 accumulation on the MXU (TPU
    matmuls default to bf16 passes, which costs ~1% error on scaled DCT
    coefficients -- far too much for pixel output).
    """
    a = jnp.asarray(dct_lut_f32(), dtype=dtype)
    x = jnp.asarray(blocks, dtype=dtype)
    return jnp.einsum(
        "xu,...uv,yv->...xy",
        a, x, a,
        precision=precision,
        preferred_element_type=dtype,
    )


def fdct8x8_matmul(blocks, dtype=jnp.float32, precision="highest"):
    """MXU form: FDCT2(X) = A^T @ X @ A."""
    a = jnp.asarray(dct_lut_f32(), dtype=dtype)
    x = jnp.asarray(blocks, dtype=dtype)
    return jnp.einsum(
        "xu,...xy,yv->...uv",
        a, x, a,
        precision=precision,
        preferred_element_type=dtype,
    )
