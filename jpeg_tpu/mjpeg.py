"""Motion-JPEG stream utilities.

The reference's MJPEG support is exactly "headerless frames decode with
the implicit Annex-K tables" (common.c:90-99, SURVEY §3.3) -- there is no
container parsing.  This module adds the stream-level pieces a framework
needs around that:

  * ``split_stream``: cut a concatenated-JPEG byte stream (the common
    raw .mjpeg layout: SOI..EOI SOI..EOI ...) into frames;
  * ``decode_stream``: batch-decode frames with per-frame fault
    isolation -- a corrupt frame is reported and skipped, the batch
    continues (SURVEY §5 failure-detection row).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from .api import DecodedImage, decode_jpeg
from .errors import JpegError


def split_stream(data: bytes) -> List[bytes]:
    """Split concatenated JPEG frames on SOI..EOI boundaries.

    EOI markers inside entropy-coded data can't occur (byte stuffing maps
    payload 0xFF to 0xFF00, io.c:277-290), so scanning for FFD8/FFD9
    pairs is exact for baseline streams.
    """
    buf = np.frombuffer(data, dtype=np.uint8)
    if buf.size < 4:
        return []
    is_ff = buf[:-1] == 0xFF
    soi = np.nonzero(is_ff & (buf[1:] == 0xD8))[0]
    eoi = np.nonzero(is_ff & (buf[1:] == 0xD9))[0]
    frames: List[bytes] = []
    start_idx = 0
    used_eoi = -1
    for s in soi:
        if s <= used_eoi:
            continue  # SOI inside a previous frame's span (shouldn't happen)
        nxt = eoi[np.searchsorted(eoi, s)] if np.searchsorted(eoi, s) < eoi.size else None
        if nxt is None:
            break
        frames.append(data[s : int(nxt) + 2])
        used_eoi = int(nxt)
    return frames


@dataclass
class StreamResult:
    """Batch decode outcome with per-frame fault isolation."""

    frames: List[Optional[DecodedImage]]
    errors: List[Tuple[int, str]] = field(default_factory=list)

    @property
    def ok_count(self) -> int:
        return sum(f is not None for f in self.frames)


def decode_stream_device(data: bytes, chunk: int = 8):
    """Raw MJPEG bytes -> device-resident pixel batch [F, H, W, C].

    The streaming deployment shape: all frames share one geometry and
    (implicit or repeated) Huffman tables, entropy + dense decode run on
    the accelerator in pipelined chunks, and the pixels stay in HBM.
    Raises on malformed streams -- use ``decode_stream`` when per-frame
    fault isolation matters more than throughput.
    """
    from .models.device_decode import DeviceDecoder

    parts = split_stream(data)
    if not parts:
        from .errors import FileIOError

        raise FileIOError("no JPEG frames in stream")
    dec = DeviceDecoder.for_stream(parts[0])
    return dec.decode_batch(parts, chunk=chunk)


def decode_stream(
    data: bytes, exact: bool = False, entropy: str = "auto"
) -> StreamResult:
    """Decode every frame of a raw MJPEG byte stream; isolate failures."""
    parts = split_stream(data)
    out: List[Optional[DecodedImage]] = []
    errors: List[Tuple[int, str]] = []
    for i, frame in enumerate(parts):
        try:
            out.append(decode_jpeg(frame, exact=exact, entropy=entropy))
        except JpegError as e:
            out.append(None)
            errors.append((i, f"{type(e).__name__}: {e}"))
    return StreamResult(frames=out, errors=errors)
