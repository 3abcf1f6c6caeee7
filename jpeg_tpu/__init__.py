"""jpeg_tpu: a TPU-native baseline JPEG engine (JAX/XLA/Pallas).

Brand-new implementation with the capabilities of the reference C99 codec
(xbarin02/jpeg): ITU-T T.81 baseline sequential decode and encode --
8/12-bit, grayscale/YCbCr/YCCK, 4:4:4/4:2:2/4:2:0, interleaved and
non-interleaved scans, restart markers, quality 1..100 with default or
per-image optimized Huffman tables, Motion-JPEG streams.

Architecture (TPU-first, not a port):
  * dense per-block pipeline (DCT/quant/level-shift/resample/color) runs as
    batched XLA/Pallas kernels over [n_blocks, 8, 8] tensors;
  * entropy coding is a parallel bitstream stage: restart-interval segments
    decode independently, with prefix-sum recovery of global MCU placement;
  * multi-chip scaling via jax.sharding meshes (MCU tiles within a frame,
    frames across a Motion-JPEG batch).

float64 support is enabled globally: the bit-exact conformance mode
reproduces the reference's mixed f32/f64 arithmetic.
"""

import jax

jax.config.update("jax_enable_x64", True)

from .api import DecodedImage, decode_coefficients, decode_jpeg  # noqa: E402
from .encoder import EncodeParams, encode_jpeg  # noqa: E402
from . import mjpeg  # noqa: E402
from .models.device_decode import DeviceDecoder  # noqa: E402
from .models.device_encode import DeviceEncoder  # noqa: E402
from .errors import (  # noqa: E402
    CorruptStream,
    FileIOError,
    JpegError,
    NoMoreData,
    UnsupportedError,
)

__version__ = "0.1.0"

__all__ = [
    "DecodedImage",
    "decode_coefficients",
    "decode_jpeg",
    "EncodeParams",
    "encode_jpeg",
    "DeviceDecoder",
    "DeviceEncoder",
    "JpegError",
    "UnsupportedError",
    "FileIOError",
    "NoMoreData",
    "CorruptStream",
    "__version__",
]
