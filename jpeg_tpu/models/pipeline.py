"""Dense per-block pipelines: coefficients <-> pixels.

This is the decoder epilogue (decoder.c:456-470: dequantize -> IDCT ->
level shift -> blocks-to-frame -> upsample -> color) and the encoder
prologue (encoder.c:176-193: downsample -> frame-to-blocks -> level shift
-> FDCT -> quantize) re-expressed as batched tensor programs over
``[n_blocks, 8, 8]`` tensors per component -- the shapes XLA tiles onto
the MXU/VPU.  Everything here is jit-compatible; geometry is static.

``exact=True`` selects the bit-exact kernels (ordered f32 DCT, mixed f64
color); ``exact=False`` the MXU matmul DCT and f32 color.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..geometry import FrameGeometry
from ..ops.blocks import blocks_to_plane, plane_to_blocks
from ..ops.color import rgb_to_ycc, to_rgb
from ..ops.dct import fdct8x8_exact, fdct8x8_matmul, idct8x8_exact, idct8x8_matmul
from ..ops.quant import dequantize, quantize
from ..ops.resample import downsample_box, upsample_nn


def decode_component_plane(
    coeffs,  # int32 [n_blocks, 64] raster-order coefficients
    qtable,  # [64] quantization table (raster order)
    b_y: int,
    b_x: int,
    precision: int,
    exact: bool = True,
):
    """dequant -> IDCT -> +level-shift -> planar raster [b_y*8, b_x*8]."""
    flt = dequantize(coeffs, qtable)
    blocks = flt.reshape(-1, 8, 8)
    idct = idct8x8_exact(blocks) if exact else idct8x8_matmul(blocks)
    shift = jnp.float32(1 << (precision - 1))
    shifted = idct + shift
    return blocks_to_plane(shifted, b_y, b_x)


def encode_component_plane(
    plane,  # float32 [b_y*8, b_x*8] level-unshifted samples
    qtable,
    precision: int,
    exact: bool = True,
):
    """-level-shift -> FDCT -> quantize -> int32 [n_blocks, 64] raster."""
    b_y, b_x = plane.shape[-2] // 8, plane.shape[-1] // 8
    shift = jnp.float32(1 << (precision - 1))
    blocks = plane_to_blocks(plane, b_y, b_x) - shift
    fdct = fdct8x8_exact(blocks) if exact else fdct8x8_matmul(blocks)
    return quantize(fdct.reshape(-1, 64), qtable)


def decode_frame(
    planes: Dict[int, object],  # cid -> int32 [n_blocks, 64]
    geom: FrameGeometry,
    qtables,  # [4, 64]
    exact: bool = True,
):
    """Full dense decode: coefficient planes -> RGB float frame.

    Returns float32 [size_y, size_x, Nf] after color conversion (the
    reference's write_image pre-PNM state, decoder.c:433-454).
    """
    size_y, size_x = geom.size_y, geom.size_x
    chans = []
    # The reference assembles channels by ASCENDING component id
    # (transform_components_to_frame walks ids 0..255, frame.c:49-81),
    # not SOF order; the lowest id becomes channel 0 (= Y for color).
    for comp in sorted(geom.components, key=lambda c: c.cid):
        plane = decode_component_plane(
            planes[comp.cid],
            jnp.asarray(qtables)[comp.tq],
            comp.b_y,
            comp.b_x,
            geom.precision,
            exact=exact,
        )
        c_y, c_x = comp.b_y * 8, comp.b_x * 8
        step_y = size_y // c_y if c_y else 1
        step_x = size_x // c_x if c_x else 1
        up = upsample_nn(plane, step_y, step_x)
        if up.shape[-2:] != (size_y, size_x):
            # Non-dividing sampling ratio (corrupt/exotic SOF): the
            # reference paints step_y x step_x patches and NEVER touches
            # the remaining frame margin -- malloc'd storage, which for
            # the fresh context pages reads as 0.0 (frame.c:28,60-76).
            up = jnp.zeros((size_y, size_x), up.dtype).at[
                : up.shape[-2], : up.shape[-1]
            ].set(up[..., :size_y, :size_x])
        chans.append(up)
    frame = jnp.stack(chans, axis=-1)
    return to_rgb(frame, geom.precision, exact=exact)


def encode_frame(
    frame,  # float32 [size_y, size_x, Nf] padded interleaved raster (RGB)
    geom: FrameGeometry,
    qtables,  # [4, 64]
    exact: bool = True,
) -> Dict[int, object]:
    """Full dense encode: padded RGB raster -> coefficient planes.

    Color conversion only touches the true [height, width] window, exactly
    like frame_to_ycc (frame.c:162-163): the MCU padding keeps its raw
    replicated RGB values and flows into the DCT unconverted.  (A quirk,
    but required for byte-identical output with the reference encoder.)
    """
    frame = jnp.asarray(frame)
    ycc = rgb_to_ycc(frame, geom.precision, exact=exact)
    size_y, size_x = geom.size_y, geom.size_x
    if (size_y, size_x) != (geom.height, geom.width):
        in_y = jnp.arange(size_y)[:, None] < geom.height
        in_x = jnp.arange(size_x)[None, :] < geom.width
        ycc = jnp.where((in_y & in_x)[..., None], ycc, frame)
    out = {}
    for comp in geom.components:
        c_y, c_x = comp.b_y * 8, comp.b_x * 8
        step_y, step_x = size_y // c_y, size_x // c_x
        chan = downsample_box(ycc[..., geom.index_of(comp.cid)], step_y, step_x)
        out[comp.cid] = encode_component_plane(
            chan,
            jnp.asarray(qtables)[comp.tq],
            geom.precision,
            exact=exact,
        )
    return out
