"""Batched (multi-frame) dense pipelines -- the Motion-JPEG workhorse.

Same math as models/pipeline.py but with an explicit leading frame-batch
axis on every tensor, so the whole thing jits once and shards over a
device mesh: the batch axis is the data-parallel axis (frames are fully
independent, SURVEY §2.2 row 1), the block axis is the tile-parallel axis
(8x8 blocks have zero cross-block dependence, row 2).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp

from ..ops.color import rgb_to_ycc, to_rgb
from ..ops.dct import fdct8x8_exact, fdct8x8_kron, idct8x8_exact, idct8x8_kron
from ..ops.quant import dequantize, quantize
from ..ops.resample import downsample_box, upsample_nn


def decode_blocks_batch(
    coeffs,  # int32 [B, b_y*b_x, 64] raster order
    qtable,  # [64]
    b_y: int,
    b_x: int,
    precision: int,
    exact: bool = False,
):
    """dequant -> IDCT -> +shift -> [B, b_y*8, b_x*8] planes.

    Fast path: dequant fuses into the flattened Kronecker-DCT matmul
    ([B*n, 64] @ [64, 64] on the MXU).
    """
    flt = dequantize(coeffs, qtable)
    b = flt.shape[0]
    shift = jnp.float32(1 << (precision - 1))
    if exact:
        blocks = idct8x8_exact(flt.reshape(b, b_y, b_x, 8, 8)) + shift
    else:
        blocks = (idct8x8_kron(flt) + shift).reshape(b, b_y, b_x, 8, 8)
    return blocks.transpose(0, 1, 3, 2, 4).reshape(b, b_y * 8, b_x * 8)


def encode_plane_batch(
    plane,  # float32 [B, b_y*8, b_x*8]
    qtable,
    precision: int,
    exact: bool = False,
):
    """-shift -> FDCT -> quantize -> int32 [B, b_y*b_x, 64]."""
    b, h, w = plane.shape
    b_y, b_x = h // 8, w // 8
    blocks = plane.reshape(b, b_y, 8, b_x, 8).transpose(0, 1, 3, 2, 4)
    blocks = blocks - jnp.float32(1 << (precision - 1))
    if exact:
        fdct = fdct8x8_exact(blocks).reshape(b, b_y * b_x, 64)
    else:
        fdct = fdct8x8_kron(blocks.reshape(b, b_y * b_x, 64))
    return quantize(fdct, qtable)


@dataclass(frozen=True)
class BatchConfig:
    """Static geometry of a batched color pipeline (4:2:0/4:2:2/4:4:4)."""

    height: int
    width: int
    h: int = 2  # luma sampling factors
    v: int = 2
    precision: int = 8

    @property
    def m_x(self) -> int:
        return -(-self.width // (8 * self.h))

    @property
    def m_y(self) -> int:
        return -(-self.height // (8 * self.v))

    @property
    def luma_grid(self) -> Tuple[int, int]:
        return self.m_y * self.v, self.m_x * self.h

    @property
    def chroma_grid(self) -> Tuple[int, int]:
        return self.m_y, self.m_x

    @property
    def n_luma_blocks(self) -> int:
        by, bx = self.luma_grid
        return by * bx

    @property
    def n_chroma_blocks(self) -> int:
        by, bx = self.chroma_grid
        return by * bx


def decode_batch_ycc(cfg: BatchConfig, y, cb, cr, qt_luma, qt_chroma, exact=False):
    """Batched color decode: 3 coefficient planes -> RGB [B, H, W, 3]."""
    lby, lbx = cfg.luma_grid
    cby, cbx = cfg.chroma_grid
    yp = decode_blocks_batch(y, qt_luma, lby, lbx, cfg.precision, exact)
    cbp = decode_blocks_batch(cb, qt_chroma, cby, cbx, cfg.precision, exact)
    crp = decode_blocks_batch(cr, qt_chroma, cby, cbx, cfg.precision, exact)
    cbp = upsample_nn(cbp, cfg.v, cfg.h)
    crp = upsample_nn(crp, cfg.v, cfg.h)
    frame = jnp.stack([yp, cbp, crp], axis=-1)
    return to_rgb(frame, cfg.precision, exact=exact)


def encode_batch_ycc(cfg: BatchConfig, rgb, qt_luma, qt_chroma, exact=False):
    """Batched color encode: RGB [B, H, W, 3] -> 3 coefficient planes."""
    ycc = rgb_to_ycc(rgb, cfg.precision, exact=exact)
    yp = ycc[..., 0]
    cbp = downsample_box(ycc[..., 1], cfg.v, cfg.h)
    crp = downsample_box(ycc[..., 2], cfg.v, cfg.h)
    y = encode_plane_batch(yp, qt_luma, cfg.precision, exact)
    cb = encode_plane_batch(cbp, qt_chroma, cfg.precision, exact)
    cr = encode_plane_batch(crp, qt_chroma, cfg.precision, exact)
    return y, cb, cr


def roundtrip_step_ycc(cfg: BatchConfig, y, cb, cr, qt_luma, qt_chroma):
    """Decode + re-encode + dry-pass histogram: the full-pipeline step.

    The histogram is the parallel analog of the reference's dry pass
    (encoder.c:525-558): summing one-hot category counts over the sharded
    batch/block axes lowers to an XLA all-reduce across the mesh.
    """
    rgb = decode_batch_ycc(cfg, y, cb, cr, qt_luma, qt_chroma)
    y2, cb2, cr2 = encode_batch_ycc(cfg, rgb, qt_luma, qt_chroma)
    dc = jnp.abs(y2[..., 0])
    cats = jnp.where(dc == 0, 0, jnp.floor(jnp.log2(jnp.maximum(dc, 1))) + 1)
    hist = (cats[..., None] == jnp.arange(16)).sum(axis=(0, 1))
    return y2, cb2, cr2, hist
