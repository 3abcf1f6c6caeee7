"""Top-level decode/encode API.

``decode_jpeg`` is the analog of the reference's process_jpeg_stream
(decoder.c:661-685): parse markers, entropy-decode all scans, run the dense
pipeline.  Entropy decoding uses the fastest available backend unless
``entropy='serial'`` forces the oracle path.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import lru_cache
from typing import Dict, Optional

import numpy as np

from .errors import CorruptStream, JpegError, UnsupportedError
from .format.parse import Codestream, parse_codestream, unstuff
from .geometry import FrameGeometry
from .models.pipeline import decode_frame
from .tables import HuffSpec, HuffTable, derive_table
from .utils.pnm import write_pnm


@lru_cache(maxsize=64)
def _derive_cached(spec: HuffSpec) -> HuffTable:
    return derive_table(spec)


@lru_cache(maxsize=32)
def _jitted_decode_frame(geom: FrameGeometry, exact: bool):
    """One compiled executable per (geometry, mode): the dense pipeline
    builds hundreds of ops, and on a remote TPU eager dispatch would cost
    a round trip per op.

    Exact mode stays EAGER: XLA contracts mul+add to FMA inside jitted
    fusions, which breaks bit-exactness with the reference's strict-IEEE
    float chain (see ops/dct._contract_last_exact).  Eager per-op
    dispatch rounds every op separately, matching the C build.
    """
    import jax

    def fn(planes, qtables):
        return decode_frame(planes, geom, qtables, exact=exact)

    return fn if exact else jax.jit(fn)


@dataclass
class DecodedImage:
    """Decoded frame: float RGB raster plus geometry/metadata."""

    frame: np.ndarray  # float32 [size_y, size_x, Nf], RGB (K dropped later)
    geometry: FrameGeometry
    codestream: Codestream
    coefficients: Dict[int, np.ndarray]  # cid -> int32 [n_blocks, 64]

    @property
    def width(self) -> int:
        return self.geometry.width

    @property
    def height(self) -> int:
        return self.geometry.height

    def to_pnm(self) -> bytes:
        """PPM/PGM bytes exactly like write_frame (frame.c:548-567)."""
        return write_pnm(
            self.frame,
            self.geometry.width,
            self.geometry.height,
            self.geometry.precision,
        )

    def pixels(self) -> np.ndarray:
        """[height, width, C] integer samples (rounded + clamped)."""
        c = 3 if self.geometry.nf >= 3 else 1
        window = self.frame[: self.height, : self.width, :c]
        t = np.trunc(window)
        frac = window - t
        rounded = np.where(np.abs(frac) >= 0.5, t + np.copysign(1.0, window), t)
        maxval = (1 << self.geometry.precision) - 1
        return np.clip(rounded.astype(np.int32), 0, maxval)


def expected_mcus(geom: FrameGeometry, info) -> int:
    """MCU steps the geometry implies for one scan.

    Interleaved (Ns>1): the frame MCU grid (common.c:174).  Ns=1
    non-interleaved: each step covers H*V consecutive blocks of the
    component's own grid (decoder.c:274-302).
    """
    if info.ns == 0:
        # read_macroblock returns NO_MORE_DATA at once (decoder.c:271-273).
        return 0
    if info.ns > 1:
        return geom.n_mcus
    c = geom.by_id(info.component_ids[0])
    step = max(1, c.h * c.v)
    return -(-c.n_blocks // step)


def checks_enabled() -> bool:
    """Sanitizer mode (SURVEY §5): JPEG_TPU_CHECKS=1 arms extra decode
    invariant checks (MCU-count vs geometry, NaN guards in fast paths)."""
    return checks_level() >= 1


def checks_level() -> int:
    """JPEG_TPU_CHECKS tiers: 0 off, 1 host-side invariants, 2 adds
    in-kernel jax.experimental.checkify checks on the lockstep scan +
    placement (CPU test tier; the checks retrace the program)."""
    v = os.environ.get("JPEG_TPU_CHECKS", "")
    if not v or v == "0":
        return 0
    return int(v) if v.isdigit() else 1


def decode_coefficients(
    data: bytes, entropy: str = "auto"
) -> tuple[Codestream, Dict[int, np.ndarray]]:
    """Parse + entropy-decode only: JPEG bytes -> coefficient planes."""
    try:
        return _decode_coefficients(data, entropy)
    except JpegError:
        if entropy != "auto":
            raise
        # An auto-picked fast engine may reject degenerate/corrupt
        # layouts the reference still decodes (e.g. a scan referencing
        # an undeclared component id, which it simply skips); the serial
        # oracle defines our behavior there -- retry once with it.  A
        # genuinely corrupt stream re-raises from the oracle.
        return _decode_coefficients(data, "serial")


def _decode_coefficients(
    data: bytes, entropy: str
) -> tuple[Codestream, Dict[int, np.ndarray]]:
    cs = parse_codestream(data)
    geom = cs.geometry
    if geom is None:
        raise UnsupportedError("no frame header before scan data")

    planes = {
        c.cid: np.zeros((c.n_blocks, 64), dtype=np.int32)
        for c in geom.components
    }

    cs.mcus_decoded = []
    for scan in cs.scans:
        if scan.info.ns == 0:
            # Ns=0 scan: the reference's read_macroblock returns
            # NO_MORE_DATA immediately (decoder.c:271-273), so read_ecs
            # processes zero macroblocks and the marker walk continues.
            cs.mcus_decoded.append(0)
            continue
        tables = {k: _derive_cached(spec) for k, spec in scan.htables.items()}
        backend = entropy
        if backend == "auto":
            from . import native as _native

            if _native.available():
                backend = "native"
            else:
                # Lockstep decodes restart segments in parallel lanes, but
                # its per-step cost is fixed -- it only amortizes with
                # enough lanes; otherwise the serial reader wins.
                backend = "lockstep" if len(scan.ecs_ranges) >= 16 else "serial"
        if backend == "native":
            from . import native as _native

            if not _native.available():
                raise UnsupportedError(
                    "entropy='native' requested but the native library is "
                    "unavailable (no C++ toolchain?); use entropy='auto'"
                )
            from .entropy.native import decode_scan_native
            from .format.parse import unstuff_ranges

            seg_bytes, seg_offsets = unstuff_ranges(data, scan.ecs_ranges)
            n = decode_scan_native(
                geom,
                scan.info,
                tables,
                planes,
                ri=scan.ri,
                seg_bytes=seg_bytes,
                seg_offsets=seg_offsets,
            )
            cs.mcus_decoded.append(int(n))
            continue
        segments = [unstuff(data[s:e]) for (s, e) in scan.ecs_ranges]
        if backend == "serial":
            from .entropy.serial import decode_scan_serial

            n = decode_scan_serial(geom, scan.info, tables, segments, planes)
        elif backend == "lockstep":
            from .entropy.lockstep import decode_scan_lockstep

            n = decode_scan_lockstep(geom, scan.info, tables, segments, planes)
        elif backend == "lockstep-jax":
            from .entropy.lockstep_jax import decode_scan_lockstep_jax

            n = decode_scan_lockstep_jax(
                geom, scan.info, tables, segments, planes
            )
        elif backend == "speculative":
            # RST-less sequence parallelism: chunked self-synchronizing
            # decode (SURVEY §2.2 row 4); falls back to the serial
            # oracle when a stream defeats resolution.
            from .entropy.speculative import decode_scan_speculative

            n = decode_scan_speculative(
                geom, scan.info, tables, segments, planes, ri=scan.ri
            )
        else:
            raise UnsupportedError(f"unknown entropy backend {entropy!r}")
        cs.mcus_decoded.append(int(n))
    if checks_enabled():
        # Sanitizer: every scan must have decoded exactly the MCU count
        # its geometry implies (the reference's expected-vs-processed
        # report, common.c:174, hardened into an assertion).
        for scan, got in zip(cs.scans, cs.mcus_decoded):
            want = expected_mcus(geom, scan.info)
            if got != want:
                raise CorruptStream(
                    f"scan decoded {got} MCUs, geometry expects {want}"
                )
    return cs, planes


def decode_jpeg(
    data: bytes, exact: bool = True, entropy: str = "auto"
) -> DecodedImage:
    """Full decode: JPEG bytes -> RGB float frame (+ coefficients)."""
    cs, planes = decode_coefficients(data, entropy=entropy)
    geom = cs.geometry
    dense = _jitted_decode_frame(geom, exact)
    frame = np.asarray(dense(planes, cs.qtables.astype(np.int32)))
    if checks_enabled() and not np.isfinite(frame).all():
        # Sanitizer: the dense kernels are pure fixed-range arithmetic;
        # a NaN/Inf means a kernel bug, not bad input.
        raise AssertionError("non-finite samples out of the dense pipeline")
    return DecodedImage(frame=frame, geometry=geom, codestream=cs, coefficients=planes)
