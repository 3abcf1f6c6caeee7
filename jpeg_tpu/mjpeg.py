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

    Marker-aware: length-prefixed segment payloads are skipped, so an
    EXIF/APPn-embedded thumbnail (which contains its own SOI/EOI) cannot
    mis-split the parent frame.  Inside entropy-coded data only stuffed
    0xFF00 and RSTn bytes occur (io.c:277-290), which the candidate mask
    excludes -- so the scan is exact for baseline streams, and a
    vectorized prepass keeps the Python walk at marker granularity.
    """
    buf = np.frombuffer(data, dtype=np.uint8)
    n = buf.size
    if n < 4:
        return []
    nxt = buf[1:]
    is_marker = (
        (buf[:-1] == 0xFF)
        & (nxt != 0x00)  # stuffed 0xFF inside ECS
        & (nxt != 0xFF)  # fill bytes (io.c:196-214)
        & ~((nxt >= 0xD0) & (nxt <= 0xD7))  # RSTn: ECS continues
    )
    cand = np.nonzero(is_marker)[0]
    frames: List[bytes] = []
    p = 0
    start: Optional[int] = None
    while True:
        ci = int(np.searchsorted(cand, p))
        if ci >= cand.size:
            break
        pos = int(cand[ci])
        m = int(buf[pos + 1])
        if start is None:
            p = pos + 2
            if m == 0xD8:
                start = pos
            continue
        if m == 0xD9:  # EOI
            frames.append(data[start : pos + 2])
            start = None
            p = pos + 2
            continue
        if m in (0xD8, 0x01):  # stray SOI / TEM: no payload
            p = pos + 2
            continue
        if pos + 4 > n:
            break
        seglen = (int(buf[pos + 2]) << 8) | int(buf[pos + 3])
        if seglen < 2:
            p = pos + 2
            continue
        # Skip the payload (this is what hides embedded thumbnails);
        # after SOS the ECS follows and the candidate mask already
        # steps over stuffing and restart markers.
        p = pos + 2 + seglen
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
    from .models.device_decode import DeviceDecoder, decode_frame_rstless

    parts = split_stream(data)
    if not parts:
        from .errors import FileIOError

        raise FileIOError("no JPEG frames in stream")
    dec = DeviceDecoder.for_stream(parts[0])
    if dec.segs_per_frame <= 1 and len(parts[0]) > 8192:
        # RST-less frames have no restart lanes -- the batch engine would
        # degenerate to one lane per frame.  All frames' speculative
        # chunks batch into ONE probe/resolve/final round instead
        # (pixels stay in HBM); anything unresolvable degrades to
        # per-frame, then host, decodes.
        import jax.numpy as jnp

        from .errors import JpegError
        from .models.device_decode import decode_stream_rstless

        try:
            return decode_stream_rstless(parts)
        except JpegError:
            pass
        frames_px = []
        for p in parts:
            try:
                frames_px.append(decode_frame_rstless(p))
            except JpegError:
                # unresolvable frame: host fallback, then upload
                img = decode_jpeg(p, exact=False)
                frames_px.append(jnp.asarray(img.pixels().astype(np.uint8)))
        return jnp.stack(frames_px)
    return dec.decode_batch(parts, chunk=chunk)


def warm_stream_device(data: bytes, chunk: int = 8, max_rounds: int = 4,
                       budget_s: Optional[float] = None):
    """Warm every jit key ``decode_stream_device(data)`` will touch.

    The speculative RST-less engine learns sticky step bounds that feed
    jit STATIC arguments, so a plain warmup call can leave the NEXT call
    facing a fresh XLA compile (minutes on this toolchain).  This loops
    decode until the learned state reaches a fixed point (bucketed
    bounds converge after at most one extra round; see
    entropy/speculative.STEP_BUCKET), so timed runs that follow compile
    nothing.  ``budget_s`` bounds the warm wall-clock: when exceeded the
    loop stops early (callers time whatever state was reached).
    Returns the last decoded batch.
    """
    import time

    import jax

    from .entropy import speculative

    t0 = time.monotonic()
    out = None
    for _ in range(max(1, max_rounds)):
        snap = speculative.learned_snapshot()
        out = decode_stream_device(data, chunk=chunk)
        jax.block_until_ready(out)
        if speculative.learned_snapshot() == snap:
            break
        if budget_s is not None and time.monotonic() - t0 > budget_s:
            break
    return out


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
