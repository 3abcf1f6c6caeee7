"""Unit tests for the dense ops against independent oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from jpeg_tpu.constants import INV_ZIGZAG, ZIGZAG, scale_qtable, STD_LUMINANCE_QUANT
from jpeg_tpu.ops.blocks import blocks_to_plane, plane_to_blocks
from jpeg_tpu.ops.color import rgb_to_ycc, ycc_to_rgb, ycck_to_rgb
from jpeg_tpu.ops.dct import (
    dct_lut_f32,
    fdct8x8_exact,
    fdct8x8_matmul,
    idct8x8_exact,
    idct8x8_matmul,
)
from jpeg_tpu.ops.quant import dequantize, quantize
from jpeg_tpu.ops.resample import downsample_box, upsample_nn
from jpeg_tpu.ops.zigzag import raster_to_zigzag, zigzag_to_raster
from jpeg_tpu.utils.floatops import roundf


def _ref_idct_block(block: np.ndarray) -> np.ndarray:
    """Naive double-precision separable IDCT oracle (imgproc.c math)."""
    lut = dct_lut_f32().astype(np.float64)
    tmp = np.zeros((8, 8))
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            tmp[y, x] = sum(block[y, u] * lut[x, u] for u in range(8))
    for x in range(8):
        for y in range(8):
            out[y, x] = sum(tmp[v, x] * lut[y, v] for v in range(8))
    return out


def test_zigzag_roundtrip():
    v = np.arange(64)
    assert (zigzag_to_raster(raster_to_zigzag(v)) == v).all()
    # spot values from T.81 Figure 5
    assert ZIGZAG[1] == 1 and ZIGZAG[2] == 8 and ZIGZAG[63] == 63
    assert INV_ZIGZAG[8] == 2


def test_idct_exact_vs_oracle():
    rng = np.random.default_rng(0)
    blocks = rng.integers(-512, 512, size=(16, 8, 8)).astype(np.float32)
    ours = np.asarray(idct8x8_exact(blocks))
    for i in range(16):
        oracle = _ref_idct_block(blocks[i].astype(np.float64))
        np.testing.assert_allclose(ours[i], oracle, atol=1e-3)


def test_fdct_idct_roundtrip():
    rng = np.random.default_rng(1)
    pix = rng.uniform(-128, 127, size=(32, 8, 8)).astype(np.float32)
    rec = np.asarray(idct8x8_exact(fdct8x8_exact(pix)))
    np.testing.assert_allclose(rec, pix, atol=1e-3)


def test_matmul_dct_matches_exact():
    rng = np.random.default_rng(2)
    blocks = rng.uniform(-1000, 1000, size=(64, 8, 8)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(idct8x8_matmul(blocks)),
        np.asarray(idct8x8_exact(blocks)),
        rtol=1e-5,
        atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(fdct8x8_matmul(blocks)),
        np.asarray(fdct8x8_exact(blocks)),
        rtol=1e-5,
        atol=1e-2,
    )


def test_dct_energy_preservation():
    # The scaled DCT-II basis here is orthonormal: Parseval holds.
    rng = np.random.default_rng(3)
    x = rng.normal(size=(8, 8, 8)).astype(np.float32)
    y = np.asarray(fdct8x8_exact(x))
    np.testing.assert_allclose(
        (x**2).sum(axis=(1, 2)), (y**2).sum(axis=(1, 2)), rtol=1e-4
    )


def test_quantize_roundf_ties_away():
    q = np.ones(64, dtype=np.uint16)
    c = np.zeros((1, 64), dtype=np.float32)
    c[0, :8] = [0.5, -0.5, 1.5, -1.5, 2.5, 0.49999997, -0.49999997, 2.0]
    out = np.asarray(quantize(c, q))[0, :8]
    assert out.tolist() == [1, -1, 2, -2, 3, 0, 0, 2]


def test_dequantize_int_semantics():
    c = np.array([[3, -7, 0, 2047] + [0] * 60], dtype=np.int32)
    q = np.full(64, 255, dtype=np.uint16)
    out = np.asarray(dequantize(c, q))
    assert out.dtype == np.float32
    assert out[0, 0] == 765.0 and out[0, 1] == -1785.0 and out[0, 3] == 2047 * 255


def test_quality_scaling_matches_formula():
    q50 = scale_qtable(STD_LUMINANCE_QUANT, 50)
    np.testing.assert_array_equal(q50, STD_LUMINANCE_QUANT.astype(np.uint16))
    q100 = scale_qtable(STD_LUMINANCE_QUANT, 100)
    assert (q100 >= 1).all() and q100.max() <= 255
    q1 = scale_qtable(STD_LUMINANCE_QUANT, 1)
    assert (q1 == 255).sum() > 32  # heavily clamped


def test_blocks_plane_roundtrip():
    rng = np.random.default_rng(4)
    b_y, b_x = 3, 5
    blocks = rng.normal(size=(b_y * b_x, 8, 8)).astype(np.float32)
    plane = np.asarray(blocks_to_plane(blocks, b_y, b_x))
    assert plane.shape == (b_y * 8, b_x * 8)
    # block (1,2) lands at rows 8..16, cols 16..24
    np.testing.assert_array_equal(plane[8:16, 16:24], blocks[1 * b_x + 2])
    back = np.asarray(plane_to_blocks(plane, b_y, b_x))
    np.testing.assert_array_equal(back, blocks)


def test_resample_roundtrip_and_order():
    rng = np.random.default_rng(5)
    small = rng.normal(size=(4, 6)).astype(np.float32)
    up = np.asarray(upsample_nn(small, 2, 2))
    assert up.shape == (8, 12)
    np.testing.assert_array_equal(up[::2, ::2], small)
    np.testing.assert_array_equal(up[1::2, 1::2], small)
    down = np.asarray(downsample_box(up, 2, 2))
    np.testing.assert_allclose(down, small, rtol=1e-6)


def test_color_roundtrip():
    rng = np.random.default_rng(6)
    rgb = rng.uniform(0, 255, size=(16, 16, 3)).astype(np.float32)
    ycc = rgb_to_ycc(rgb, precision=8)
    back = np.asarray(ycc_to_rgb(ycc, precision=8))
    np.testing.assert_allclose(back, rgb, atol=0.02)


def test_ycck_grayscale_k():
    # Neutral chroma (Cb=Cr=shift): C=M=Y' so R=G=B = K - Y'*K/denom
    # (frame.c:204-210).
    pix = np.zeros((2, 2, 4), dtype=np.float32)
    pix[..., 0] = 100.0
    pix[..., 1] = 128.0
    pix[..., 2] = 128.0
    pix[..., 3] = 255.0
    out = np.asarray(ycck_to_rgb(pix, precision=8))
    expect = 255.0 - 100.0 * 255.0 / 256.0
    np.testing.assert_allclose(out[..., :3], expect, atol=1e-3)
    assert (out[..., 3] == 255.0).all()


def test_roundf_matches_c():
    xs = np.array(
        [0.5, 1.5, 2.5, -0.5, -1.5, -2.5, 0.4999999, -0.4999999, 1e9, -1e9, 0.0],
        dtype=np.float32,
    )
    out = np.asarray(roundf(jnp.asarray(xs)))
    expect = np.array([1, 2, 3, -1, -2, -3, 0, 0, 1e9, -1e9, 0], dtype=np.float32)
    np.testing.assert_array_equal(out, expect)
