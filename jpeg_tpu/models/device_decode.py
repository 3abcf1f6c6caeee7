"""Full on-device JPEG decode: compressed bytes in, pixel frames out.

The deployment shape for TPU ingestion: upload only the entropy-coded
words (~0.2 MB for a 1080p q75 frame instead of ~12 MB of coefficients or
~25 MB of pixels), then run BOTH stages on the device --

  lockstep entropy decode  (entropy.lockstep_jax.decode_scan_device)
  -> [F * total_blocks, 64] coefficients in HBM
  dense decode             (dequant -> IDCT -> upsample -> color -> u8)
  -> uint8 frames [F, H, W, C] that stay in HBM for downstream models.

One jitted executable per (geometry, tables, batch shape).  Frames of a
Motion-JPEG stream share geometry and (implicit MJPEG) tables, so a whole
batch decodes in a single call with lanes = frames x restart segments.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy.lockstep import ScanPlan
from ..entropy.lockstep_jax import (
    _cached_plan,
    _grow_steps,
    _max_steps_for,
    _place_emissions,
    _scan_lanes,
    _scan_lanes_phased,
    pack_words,
    decode_scan_device,
)
from ..errors import UnsupportedError
from ..format.parse import parse_codestream, unstuff, unstuff_ranges
from ..geometry import FrameGeometry
from ..models.batch import decode_blocks_batch
from ..ops.color import to_rgb, ycc_to_rgb_planar
from ..ops.resample import upsample_nn
from ..utils.floatops import roundf


_UPLOAD_RATE = [None]  # measured host->device B/s, once per process


def _measured_upload_rate() -> float:
    """SUSTAINED host->device upload bandwidth, measured once per process.

    The rows-vs-flat prep trade hinges on it: padded rows upload ~2.5x
    the compressed bytes but skip the on-device lane-matrix rebuild
    gather (~6 ms per 8x1080p chunk); that is a win only when uploads
    are effectively free (PCIe), a loss on a slow link.  An 8 MB burst
    probe measured >=400 MB/s on this box's tunnel while the sustained
    64-frame stream achieved 62 MB/s (buffering soaks small transfers),
    so the probe sends a second, LARGER buffer and times that: 32 MB is
    past the burst window here and costs ~3 ms on real PCIe.
    """
    if _UPLOAD_RATE[0] is None:
        try:
            import time

            jax.block_until_ready(jax.device_put(np.ones(1 << 20, np.uint32)))
            buf = np.ones(8 << 20, np.uint32)  # 32 MB
            t0 = time.perf_counter()
            jax.block_until_ready(jax.device_put(buf))
            _UPLOAD_RATE[0] = buf.nbytes / (time.perf_counter() - t0)
        except Exception:  # backend unreachable: caller's dispatch fails too
            _UPLOAD_RATE[0] = float("inf")
        from ..utils.metrics import default_metrics

        default_metrics.counters["device_decode.upload_Bps"] = int(
            _UPLOAD_RATE[0] if np.isfinite(_UPLOAD_RATE[0]) else -1
        )
    return _UPLOAD_RATE[0]


# Above this measured upload rate, the bigger rows upload costs less
# than the flat mode's on-device rebuild gather saves.  Break-even is
# ~1.5x-payload / 6 ms-per-chunk ~= 470 MB/s at the bench shape; the
# margin is asymmetric (a wrong "rows" pick puts 2.5x the payload on a
# slow wire; a wrong "flat" pick costs ~6 ms/chunk of device gather),
# so the threshold sits well above break-even.
_ROWS_MIN_UPLOAD_BPS = 800e6


def _is_pallas_compile_error(e: Exception) -> bool:
    """True when an exception looks like a Pallas/Mosaic kernel COMPILE
    failure (vs a data/shape error we must not mask).  Matched on the
    message because the backend surfaces these as generic
    JaxRuntimeError/XlaRuntimeError wrappers."""
    msg = f"{type(e).__name__}: {e}"
    return any(
        key in msg
        for key in ("Mosaic", "mosaic", "pallas", "Pallas",
                    "failed to legalize")
    )


def _decode_impl(
    plan: ScanPlan,
    geom: FrameGeometry,
    words: jnp.ndarray,  # [F*spf, Wn] uint32
    nbits: jnp.ndarray,  # [F*spf] int32
    qtables: jnp.ndarray,  # [4, 64] int32
    max_steps: int,
    frames: int,
    segs_per_frame: int,
    place_ri: int = 0,
    interpret: bool = False,
):
    total_blocks = sum(c.n_blocks for c in geom.components)
    if place_ri:
        # Pallas lane-region placement (entropy/place_pallas): the scan
        # is unchanged; emissions place as VMEM-resident masked selects
        # bounded per tile by the scan's own consumed-step counters --
        # the scatter-floor bypass for eligible (uniform-lane) streams.
        from ..entropy.place_pallas import place_emissions_region

        counts, (em_key, em_val), starved, nsteps = _scan_lanes(
            plan, words, nbits, max_steps
        )
        coeffs = place_emissions_region(
            plan, em_key, em_val, nsteps, frames,
            segs_per_frame or words.shape[0], place_ri,
            interpret=interpret,
        )
    else:
        counts, coeffs, starved = decode_scan_device(
            plan,
            words,
            nbits,
            max_steps,
            total_blocks,
            frames=frames,
            segs_per_frame=segs_per_frame,
        )
    coeffs = coeffs.reshape(frames, total_blocks, 64)
    # Total decoded MCUs: the always-on cheap invariant (the reference
    # prints expected-vs-processed unconditionally, common.c:174).  The
    # scalar rides back with the starvation flag -- zero extra round
    # trips (decode_batch's lazy sweep).
    return _dense_from_coeffs(coeffs, geom, qtables), starved, counts.sum()


def _dense_from_coeffs(coeffs, geom: FrameGeometry, qtables):
    """[F, total_blocks, 64] plane-ordered coefficients -> device pixels
    [F, H, W, C] (the fast dense pipeline; shared by the restart-segment
    and speculative decode paths)."""
    size_y, size_x = geom.size_y, geom.size_x
    chans = []
    off = 0
    for comp in geom.components:
        n = comp.n_blocks
        plane = decode_blocks_batch(
            coeffs[:, off : off + n],
            qtables[comp.tq],
            comp.b_y,
            comp.b_x,
            geom.precision,
            exact=False,
        )
        off += n
        chans.append(
            upsample_nn(plane, size_y // (comp.b_y * 8), size_x // (comp.b_x * 8))
        )
    maxval = (1 << geom.precision) - 1
    out_dt = jnp.uint8 if geom.precision <= 8 else jnp.uint16

    def quantize_u8(p):
        return jnp.clip(roundf(p), 0, maxval).astype(out_dt)

    if geom.nf == 3:
        # Planar color math + u8-late interleave: stacking f32 planes
        # into a [..., 3] minor axis costs ~30 ms per 8x1080p batch on
        # v5e (3 lanes of 128 used); planar keeps the VPU full and the
        # one unavoidable interleave happens on 1/4 the bytes.
        r, g, b = ycc_to_rgb_planar(
            chans[0], chans[1], chans[2], geom.precision, exact=False
        )
        px = jnp.stack(
            [quantize_u8(r), quantize_u8(g), quantize_u8(b)], axis=-1
        )
        return px[:, : geom.height, : geom.width, :]

    frame = jnp.stack(chans, axis=-1)
    rgb = to_rgb(frame, geom.precision, exact=False)
    px = quantize_u8(rgb)
    # Drop the dummy K channel of YCCK frames (write_frame semantics,
    # frame.c:548-567): deliverable is RGB (or one gray channel).
    nch = 3 if geom.nf >= 3 else 1
    return px[:, : geom.height, : geom.width, :nch]


@partial(
    jax.jit,
    static_argnames=("plan", "geom", "max_steps", "frames", "segs_per_frame",
                     "place_ri", "interpret"),
)
def _decode_device(plan, geom, words, nbits, qtables, max_steps, frames,
                   segs_per_frame, place_ri=0, interpret=False):
    return _decode_impl(plan, geom, words, nbits, qtables, max_steps, frames,
                        segs_per_frame, place_ri=place_ri, interpret=interpret)


@partial(
    jax.jit,
    static_argnames=("plan", "geom", "max_steps", "frames", "segs_per_frame"),
)
def _decode_device_learn(plan, geom, words, nbits, qtables, max_steps,
                         frames, segs_per_frame):
    """Classic single-phase decode that ALSO returns per-lane consumed
    steps -- the one-off learning pass feeding the phased scan's sorted
    lane order and step budget."""
    total_blocks = sum(c.n_blocks for c in geom.components)
    spf = segs_per_frame or words.shape[0]
    counts, stream, starved, nsteps = _scan_lanes(
        plan, words, nbits, max_steps
    )
    coeffs = _place_emissions(
        plan, counts, [stream], frames, spf, total_blocks
    )
    px = _dense_from_coeffs(
        coeffs.reshape(frames, total_blocks, 64), geom, qtables
    )
    return px, starved, counts.sum(), nsteps


@partial(
    jax.jit,
    static_argnames=("plan", "geom", "phases", "frames", "segs_per_frame"),
)
def _decode_device_phased(plan, geom, words, nbits, qtables, perm, phases,
                          frames, segs_per_frame):
    """Phased narrowed decode: lanes arrive SORTED (rows written in
    predicted-step order by the native prep); each phase continues only
    the predicted-long prefix, so the placement scatter's attempts track
    the true symbol count instead of lanes x global-max-steps (the
    round-2 roofline's dominant term).  ``perm`` maps sorted lane ->
    original (frame-major) lane for placement."""
    total_blocks = sum(c.n_blocks for c in geom.components)
    counts, streams, starved, _ = _scan_lanes_phased(
        plan, words, nbits, phases
    )
    coeffs = _place_emissions(
        plan, counts, streams, frames, segs_per_frame, total_blocks,
        perm=perm, combine="set",
    )
    px = _dense_from_coeffs(
        coeffs.reshape(frames, total_blocks, 64), geom, qtables
    )
    return px, starved, counts.sum()


@partial(
    jax.jit,
    static_argnames=("plan", "geom", "max_steps", "frames", "segs_per_frame",
                     "wn", "place_ri", "interpret"),
)
def _decode_device_flat(plan, geom, buf, starts, nbits, qtables, max_steps,
                        frames, segs_per_frame, wn, place_ri=0,
                        interpret=False):
    """Flat-upload variant: ship the tight word packing (~compressed size)
    and rebuild the [S, Wn] lane matrix on-device with one row gather
    (measured faster than a row dynamic_slice lowering on this target) --
    lookahead columns past a row's end read the next row's words, which
    the decoder never consumes (the nbits overrun check kills the lane
    first; the tail rows stay in bounds via the buffer's wn-word slack)."""
    idx = starts[:, None] + jnp.arange(wn, dtype=jnp.int32)[None, :]
    words = jnp.take(buf, idx, mode="clip")
    return _decode_impl(plan, geom, words, nbits, qtables, max_steps, frames,
                        segs_per_frame, place_ri=place_ri, interpret=interpret)


@dataclass
class DeviceDecoder:
    """Compiled whole-batch decoder for streams sharing one geometry.

    Build once from a representative frame, then ``decode_batch`` lists of
    JPEG byte strings (e.g. the frames of a Motion-JPEG stream).  Returns
    the device-resident pixel batch; call ``np.asarray`` on it only if the
    pixels are needed on the host.
    """

    plan: ScanPlan
    geom: FrameGeometry
    ri: int
    segs_per_frame: int
    max_steps: int
    htable_key: tuple
    # Fast-prep state: frames whose header bytes match the sample's skip
    # the Python parser entirely (identical markers -> identical geometry,
    # tables and scan start) and go through the native C++ single-pass
    # unstuff+pack (native.prep_ecs_native).
    header: bytes = b""
    scan_start: int = 0
    qtables: Optional[np.ndarray] = None
    wn: int = 0  # sticky lane-row width in u32 words (grows on demand)
    flat_blen: int = 0  # sticky flat-buffer length (words): chunks whose
    #   payload crosses a 256 KiB bucket boundary would otherwise change
    #   the jit key and recompile mid-stream (~minutes on this box)
    # Native prep mode: "rows" writes the padded [S, wn] lane matrix
    # directly (no device rebuild gather -- measured ~6 ms per 8-frame
    # 1080p chunk -- at the cost of a ~2.5x larger upload); "flat"
    # tight-packs and gathers on-device.  "auto" (default) measures the
    # host->device upload rate once and picks: rows when uploads are
    # effectively free (PCIe-class), flat on a slow link (sustained
    # stream decode is UPLOAD-BOUND there; flat measured 317 vs 193
    # Mpix/s on this box's tunnel).  JPEG_TPU_PREP overrides for A/B.
    prep_mode: str = "auto"
    # Learned per-segment step bounds (from one classic chunk's per-lane
    # consumed-step counters): subsequent chunks write lane rows in
    # DESCENDING predicted order and run the phased narrowed scan, so
    # placement-scatter attempts track the true symbol count instead of
    # lanes x global max steps.  JPEG_TPU_PHASED=0 disables for A/B.
    lane_steps: Optional[np.ndarray] = None  # [spf] predicted steps
    sort_order: Optional[np.ndarray] = None  # [spf] seg ids, desc pred
    # Pallas lane-region placement (entropy/place_pallas): when the
    # stream's segments tile MCU rows evenly, placement runs as
    # VMEM-resident masked selects (~1.6 ns/attempt for the bench shape)
    # instead of the ~6.8 ns/attempt HBM scatter, with per-tile step
    # bounds taken from the scan's own counters -- no learned schedule,
    # no lane sorting.  0 = scatter path.  JPEG_TPU_PLACE overrides:
    # "pallas" forces (interpret mode off-TPU), "scatter" disables,
    # default "auto" = eligible AND a real TPU backend.
    place_ri: int = 0
    place_interpret: bool = False

    @staticmethod
    def for_stream(sample_jpeg: bytes) -> "DeviceDecoder":
        cs = parse_codestream(sample_jpeg)
        if cs.geometry is None or len(cs.scans) != 1:
            raise UnsupportedError("device decoder needs a single-scan frame")
        scan = cs.scans[0]
        htable_key = tuple(sorted(scan.htables.items()))
        plan = _cached_plan(cs.geometry, scan.info, htable_key)
        segments = [unstuff(sample_jpeg[s:e]) for s, e in scan.ecs_ranges]
        nbits = np.array([s.size * 8 for s in segments], dtype=np.int64)
        maxlen = int(max((s.size for s in segments), default=0))
        scan_start = scan.ecs_ranges[0][0] if scan.ecs_ranges else 0
        import os as _os

        from ..entropy.place_pallas import placement_eligible

        mode = _os.environ.get("JPEG_TPU_PLACE", "auto")
        eligible = placement_eligible(plan, scan.ri, len(segments))
        try:
            backend = jax.default_backend()
        except RuntimeError:  # accelerator unreachable: caller decides
            backend = "unavailable"
        if mode == "pallas":
            use_region = eligible
        elif mode == "scatter":
            use_region = False
        else:
            use_region = eligible and backend == "tpu"
        return DeviceDecoder(
            place_ri=scan.ri if use_region else 0,
            place_interpret=backend != "tpu",
            plan=plan,
            geom=cs.geometry,
            ri=scan.ri,
            segs_per_frame=len(segments),
            max_steps=_max_steps_for(nbits, plan, scan.ri),
            htable_key=htable_key,
            header=sample_jpeg[:scan_start],
            scan_start=scan_start,
            qtables=cs.qtables.astype(np.int32),
            wn=((maxlen + 8 + 63) // 64) * 16,  # pack_words' padding, in words
        )

    def _prepare_native(self, jpegs: Sequence[bytes]):
        """C++ fast prep for header-identical frames; None -> slow path.

        "rows" mode writes the padded [S, wn] lane matrix directly in the
        single C++ pass (upload ~2.5x the compressed size, zero device
        rebuild work); "flat" mode tight-packs into one u32 buffer and
        the device rebuilds the matrix with a gather.
        """
        import os

        from .. import native

        if not self.header or not native.available():
            return None
        for data in jpegs:
            if not data.startswith(self.header):
                return None
        spf = self.segs_per_frame
        frames = len(jpegs)
        mode = os.environ.get("JPEG_TPU_PREP", self.prep_mode)
        if mode == "auto":
            self.prep_mode = mode = (
                "rows"
                if _measured_upload_rate() >= _ROWS_MIN_UPLOAD_BPS
                else "flat"
            )
        if mode == "rows":
            prepared = self._prepare_native_rows(jpegs, frames, spf)
            if prepared is not None:
                return prepared
            # fall through to the flat path (e.g. repeated row overflow)
        cap = sum(len(d) for d in jpegs) // 4 + frames * (spf + 16)
        buf = np.zeros(cap, dtype=np.uint32)
        starts = np.zeros(frames * spf, dtype=np.int32)
        lens = np.zeros(frames * spf, dtype=np.int32)
        base = 0
        for f, data in enumerate(jpegs):
            row = slice(f * spf, (f + 1) * spf)
            rc, used = native.prep_ecs_flat_native(
                data, self.scan_start, buf, base, starts[row], lens[row]
            )
            if rc != spf:
                # Malformed, truncated, or odd framing: defer to the full
                # Python parser so fast/slow prep share one failure mode
                # (the parser validates the whole marker stream before
                # padding short frames with empty lanes).
                return None
            starts[f * spf : f * spf + rc] += base
            base += used
        # Lane-matrix width must cover the longest row (+1 lookahead word).
        need = (int(lens.max()) + 3) // 4 + 2
        if need > self.wn:
            self.wn = (need + 15) // 16 * 16
        # Bucket the upload length (256 KiB steps) so jit traces reuse.
        # The buffer keeps >= wn words of tail slack so the device's
        # row dynamic_slice never clamps a real row's start.
        # (A host-side padded-matrix build was tried -- uploads measured
        # ~1.5 GB/s so the bigger upload is free -- but the host gather
        # sits on the prep critical path and measured no better.)
        blen = (base + self.wn + 1 + 65535) // 65536 * 65536
        blen = max(blen, self.flat_blen)  # sticky: stable jit key
        self.flat_blen = blen
        if blen > buf.size:
            buf = np.concatenate([buf, np.zeros(blen - buf.size, np.uint32)])
        return ("flat", buf[:blen], starts, lens * 8, self.qtables)

    def _prepare_native_rows(self, jpegs: Sequence[bytes], frames: int,
                             spf: int):
        """Padded-matrix native prep: one C++ pass per frame writes each
        unstuffed segment straight into its lane row -- the upload IS the
        lane matrix and the device spends nothing rebuilding it.

        With learned step bounds, rows are written in DESCENDING
        predicted-step order (rank-major, frames interleaved within a
        rank) and the chunk decodes on the phased narrowed scan."""
        import os as _os

        from .. import native

        sort = (
            self.sort_order
            if self.sort_order is not None
            and _os.environ.get("JPEG_TPU_PHASED", "1") != "0"
            else None
        )
        if sort is not None:
            rank_of = np.empty(spf, np.int64)
            rank_of[sort] = np.arange(spf)
        for _ in range(3):  # wn growth retries
            rows = np.zeros((frames * spf, self.wn), np.uint32)
            lens = np.zeros(frames * spf, np.int32)
            ok = True
            for f, data in enumerate(jpegs):
                if sort is None:
                    row_map = np.arange(
                        f * spf, (f + 1) * spf, dtype=np.int32
                    )
                else:
                    row_map = (rank_of * frames + f).astype(np.int32)
                rc = native.prep_ecs_rows_native(
                    data, self.scan_start, rows, row_map,
                    lens[f * spf : (f + 1) * spf],
                )
                if rc == -2:
                    # a segment outgrew the sticky row width: widen and
                    # redo the whole chunk (rare; the width sticks)
                    self.wn = self.wn * 3 // 2 // 16 * 16 + 16
                    ok = False
                    break
                if rc != spf:
                    return None  # malformed framing: Python parser path
            if ok:
                if sort is None:
                    return ("mat", rows, None, lens * 8, self.qtables)
                # nbits in row (rank-major) order; perm: sorted lane ->
                # original frame-major lane for placement
                nbits = (lens.reshape(frames, spf)[:, sort].T * 8).reshape(
                    -1
                ).astype(np.int32)
                perm = (
                    (np.arange(frames * spf) % frames) * spf
                    + sort[np.arange(frames * spf) // frames]
                ).astype(np.int32)
                return ("mats", rows, perm, nbits, self.qtables)
        return None

    def prepare(self, jpegs: Sequence[bytes]):
        """Host prep: parse + batch-unstuff + vectorized word packing."""
        fast = self._prepare_native(jpegs)
        if fast is not None:
            return fast
        parts: List[np.ndarray] = []
        lens_parts: List[np.ndarray] = []
        qts = None
        for data in jpegs:
            cs = parse_codestream(data)
            scan = cs.scans[0]
            if tuple(sorted(scan.htables.items())) != self.htable_key:
                raise UnsupportedError(
                    "frame's Huffman tables differ from the stream's -- the "
                    "batch decoder compiles tables in; re-encode with shared "
                    "(e.g. default MJPEG) tables or decode per-frame"
                )
            if cs.geometry != self.geom:
                raise UnsupportedError(
                    "frame geometry differs from the stream's -- the batch "
                    "decoder compiles geometry in; decode per-frame instead"
                )
            seg_bytes, seg_offsets = unstuff_ranges(data, scan.ecs_ranges)
            lens = np.diff(seg_offsets)
            if lens.size != self.segs_per_frame:
                # pad with empty lanes (contribute zero MCUs)
                pad = np.zeros(self.segs_per_frame - lens.size, dtype=lens.dtype)
                lens = np.concatenate([lens[: self.segs_per_frame], pad])
            parts.append(seg_bytes)
            lens_parts.append(lens)
            if qts is None:
                qts = cs.qtables.astype(np.int32)
        words, nbits = pack_words(
            np.concatenate(parts) if parts else np.zeros(0, np.uint8),
            np.concatenate(lens_parts),
        )
        return ("mat", words, None, nbits.astype(np.int32), qts)

    def _decode_prepared(self, prepared, frames: int, learn: bool = False):
        """Dispatch one prepared chunk (async) -> (pixels, aux, steps,
        nsteps-or-None), aux = [starved, decoded_mcus] int32 device
        scalars (read lazily).  ``learn`` additionally returns the
        per-lane consumed-step vector for the phased-scan training.

        If the Pallas region-placement kernel fails to COMPILE on this
        backend (a Mosaic lowering regression killed BENCH_r03 outright),
        fall back to the scatter path once and stay there -- a slower
        decode beats a dead one.
        """
        try:
            return self._dispatch_prepared(prepared, frames, learn)
        except Exception as e:  # noqa: BLE001 -- compile-time backend errors
            if not self.place_ri or not _is_pallas_compile_error(e):
                raise
            from ..utils.metrics import default_metrics

            default_metrics.count("device_decode.pallas_compile_fallbacks")
            import warnings

            warnings.warn(
                "Pallas region-placement kernel failed to compile on this "
                f"backend ({type(e).__name__}); falling back to the scatter "
                "placement path for this stream",
                RuntimeWarning,
                stacklevel=2,
            )
            self.place_ri = 0
            return self._dispatch_prepared(prepared, frames, learn)

    def _dispatch_prepared(self, prepared, frames: int, learn: bool = False):
        kind, data, starts, nbits, qts = prepared
        nb64 = nbits.astype(np.int64)
        # Aggressive step bound from the ACTUAL chunk, raised to any bound
        # this stream already taught us; starvation (checked lazily by the
        # caller) retries one bucket up and the learned bound sticks.
        max_steps = max(self.max_steps, _max_steps_for(nb64, self.plan, self.ri))
        nsteps = None
        if kind == "mats":
            out, starved, mcus = _decode_device_phased(
                self.plan,
                self.geom,
                jnp.asarray(data),
                jnp.asarray(nbits),
                jnp.asarray(qts),
                jnp.asarray(starts),  # perm
                self._phases_for(frames, max_steps),
                frames,
                self.segs_per_frame,
            )
        elif kind == "flat":
            out, starved, mcus = _decode_device_flat(
                self.plan,
                self.geom,
                jnp.asarray(data),
                jnp.asarray(starts),
                jnp.asarray(nbits),
                jnp.asarray(qts),
                max_steps,
                frames,
                self.segs_per_frame,
                self.wn,
                place_ri=self.place_ri,
                interpret=self.place_interpret,
            )
        elif learn:
            out, starved, mcus, nsteps = _decode_device_learn(
                self.plan,
                self.geom,
                jnp.asarray(data),
                jnp.asarray(nbits),
                jnp.asarray(qts),
                max_steps,
                frames,
                self.segs_per_frame,
            )
        else:
            out, starved, mcus = _decode_device(
                self.plan,
                self.geom,
                jnp.asarray(data),
                jnp.asarray(nbits),
                jnp.asarray(qts),
                max_steps,
                frames,
                self.segs_per_frame,
                place_ri=self.place_ri,
                interpret=self.place_interpret,
            )
        aux = jnp.stack(
            [jnp.reshape(starved, ()).astype(jnp.int32), jnp.reshape(mcus, ())]
        )
        return out, aux, max_steps, nsteps

    def _phases_for(self, frames: int, max_steps: int):
        """Static phase schedule from the learned per-segment bounds.

        Lanes (rank-major rows) are sorted descending, so each cut
        retires the short tail; a phase's cumulative budget must cover
        the LONGEST lane retiring in it (= the first lane past the next
        cut).  The final budget is the stream's classic step bound so a
        misprediction degrades to the single-phase cost, not an error.
        """
        spf = self.segs_per_frame
        S = frames * spf
        pred = np.repeat(self.lane_steps[self.sort_order], frames)
        cuts = [S]
        # Geometric cut ladder: photographic per-segment symbol counts
        # are TIGHT (p50~152, p95~165 on the bench stream), so the waste
        # is prediction slack, not tail lanes -- many shallow cuts at a
        # fine quantum track the sorted curve closely (host-measured
        # attempts ratio 1.50 -> 1.14 with the tightened learner).
        for d in np.unique(np.geomspace(1.2, 120, 24).astype(int)):
            n = max(128, S // int(d) // 128 * 128)
            if n < cuts[-1]:
                cuts.append(n)
        bounds = []
        for i in range(len(cuts)):
            if i + 1 < len(cuts):
                b = int(pred[min(cuts[i + 1], S - 1)])
            else:
                # the longest lane's budget: the classic bound, raised to
                # the learned max (pred may legitimately exceed the
                # optimistic classic estimate)
                b = max(max_steps, int(pred[0]) + 32)
            # 8-step quanta: fine enough to hug the lane spread, few
            # enough values that the schedule (a static jit key) settles
            bounds.append(max(64, (b + 7) // 8 * 8))
        bounds = list(np.maximum.accumulate(bounds))
        phases = []
        acc = 0
        for n, b in zip(cuts, bounds):
            if b - acc <= 0:
                continue  # this cut saves nothing; retire with previous
            phases.append((int(n), int(b - acc)))
            acc = b
        return tuple(phases)

    def _learn(self, nsteps: np.ndarray, frames: int) -> None:
        """Fold one chunk's per-lane consumed steps into the per-segment
        prediction (content is spatially stable across frames of a
        stream, so segment position k's cost repeats)."""
        per_seg = nsteps.reshape(frames, self.segs_per_frame).max(axis=0)
        # Tight slack: +4 steps, no multiplier.  The old x1.15+16 margin
        # alone cost a 1.35x attempts ratio; content drifting past the
        # bound is caught by the starvation flag and the chunk redoes
        # classically WITH learning (max-fold), so mispredictions cost
        # one retrace, not correctness.
        pred = per_seg.astype(np.int64) + 4
        if self.lane_steps is not None:
            pred = np.maximum(pred, self.lane_steps)
        self.lane_steps = pred
        self.sort_order = np.argsort(-pred, kind="stable")

    def decode_batch(self, jpegs: Sequence[bytes], chunk: int = 4):
        """-> device-resident pixel batch [F, H, W, C] (uint8/uint16).

        The batch is processed in ``chunk``-frame chunks so host work
        (marker parse, unstuffing, word packing) and the host->device
        upload of chunk k+1 overlap the device decode of chunk k --
        dispatch is asynchronous and nothing blocks until the end.
        Starvation flags are only read after all chunks are in flight;
        a starved chunk (rare: the step bound is learned per stream)
        re-runs with the next larger bound.
        """
        from ..utils.metrics import default_metrics, trace

        n = len(jpegs)
        if chunk <= 0 or n <= chunk:
            chunks = [(0, n)]
        else:
            chunks = [(i, min(i + chunk, n)) for i in range(0, n, chunk)]
        px = n * self.geom.height * self.geom.width
        with default_metrics.stage("device_decode.batch", items=px):
            flight = []
            pending_learn = []  # [(device nsteps, frames), ...]
            for lo, hi in chunks:
                try:
                    with trace("device_decode.prepare"):
                        prepared = self.prepare(jpegs[lo:hi])
                    # Every classic chunk of the FIRST batch also returns
                    # per-lane consumed steps; the max over all of them
                    # (covering the stream's content variety) sets the
                    # learned bounds that sort later batches' lanes for
                    # the phased narrowed scan.
                    # The Pallas region path needs no learned schedule
                    # (per-tile bounds come from the scan itself).
                    want_learn = (
                        self.lane_steps is None and prepared[0] == "mat"
                        and not self.place_ri
                    )
                    with trace("device_decode.dispatch"):
                        out, aux, steps, nsteps = self._decode_prepared(
                            prepared, hi - lo, learn=want_learn
                        )
                    if nsteps is not None:
                        pending_learn.append((nsteps, hi - lo))
                except UnsupportedError:
                    # Mixed stream: a frame's tables/geometry differ from
                    # the compiled stream shape.  Degrade this chunk to
                    # the per-frame path instead of killing the batch
                    # (SURVEY §5 failure-isolation row).
                    default_metrics.count("device_decode.mixed_fallbacks")
                    out = self._fallback_chunk(jpegs[lo:hi])
                    flight.append([out, None, 0, None, hi - lo, lo])
                    continue
                flight.append([out, aux, steps, prepared, hi - lo, lo])
            # Lazy starvation + MCU-accounting sweep.  All chunks' flags
            # come back in ONE device round trip -- a blocking scalar get
            # costs a full tunnel RTT (~10-20 ms here), so 8 per-chunk
            # bool() checks were ~100 ms of pure latency.
            live = [rec for rec in flight if rec[3] is not None]
            if live:
                packed = np.asarray(jnp.stack([rec[1] for rec in live]))
                for rec, row in zip(live, packed):
                    rec[1] = (bool(row[0]), int(row[1]))
            for nsteps_d, nf in pending_learn:
                self._learn(np.asarray(nsteps_d), nf)
            for rec in flight:  # rare per-chunk retries sync individually
                while rec[3] is not None and rec[1][0]:
                    default_metrics.count("device_decode.starve_retries")
                    if rec[3][0] == "mats":
                        # Phased misprediction (content drifted past the
                        # learned bounds): redo the chunk on the classic
                        # path WITH learning -- the actual per-lane
                        # counts max-fold into the sticky budgets, so
                        # the schedule converges in one step instead of
                        # an inflate ladder (each rung would retrace).
                        default_metrics.count("device_decode.phase_inflate")
                        sort_keep = self.sort_order
                        self.sort_order = None  # classic frame-major prep
                        rec[3] = self.prepare(
                            jpegs[rec[5] : rec[5] + rec[4]]
                        )
                        rec[0], aux, rec[2], nst = self._decode_prepared(
                            rec[3], rec[4], learn=(rec[3][0] == "mat")
                        )
                        row = np.asarray(aux)
                        rec[1] = (bool(row[0]), int(row[1]))
                        self.sort_order = sort_keep
                        if nst is not None:
                            self._learn(np.asarray(nst), rec[4])
                        continue
                    nb64 = rec[3][3].astype(np.int64)
                    hard_cap = _max_steps_for(
                        nb64, self.plan, self.ri, optimistic=False
                    )
                    if rec[2] >= hard_cap:
                        break
                    self.max_steps = _grow_steps(rec[2], hard_cap)
                    rec[0], aux, rec[2], _ = self._decode_prepared(
                        rec[3], rec[4]
                    )
                    row = np.asarray(aux)
                    rec[1] = (bool(row[0]), int(row[1]))
                self.max_steps = max(self.max_steps, rec[2])
                if rec[3] is not None:
                    # Always-on decoded-MCU accounting (common.c:174): a
                    # placement bug or truncated frame that drops MCUs
                    # must not ship silent black blocks.
                    want = self.plan.n_mcus * rec[4]
                    got = rec[1][1]
                    if got != want:
                        default_metrics.count("device_decode.short_mcus")
                        import warnings

                        warnings.warn(
                            f"chunk decoded {got} MCUs, geometry expects "
                            f"{want} (truncated or corrupt frames?)",
                            RuntimeWarning,
                            stacklevel=2,
                        )
            outs = [rec[0] for rec in flight]
            return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    def _fallback_chunk(self, jpegs: Sequence[bytes]):
        """Per-frame decode for frames the compiled batch path rejects
        (different Huffman tables or sampling than the stream's); sizes
        must still match so the batch can concatenate."""
        from ..api import decode_jpeg

        g = self.geom
        c = 3 if g.nf >= 3 else 1
        dt = np.uint8 if g.precision <= 8 else np.uint16
        rows = []
        for f in jpegs:
            img = decode_jpeg(f, exact=False)
            px = img.pixels().astype(dt)
            if px.shape != (g.height, g.width, c):
                raise UnsupportedError(
                    "mixed-size frame in batch: decode it separately"
                )
            rows.append(px)
        return jnp.asarray(np.stack(rows))


@partial(jax.jit, static_argnames=("geom",))
def _dense_only(geom, coeffs, qtables):
    return _dense_from_coeffs(coeffs, geom, qtables)


@partial(
    jax.jit,
    static_argnames=("plans", "geom", "steps_tup", "blocks_tup", "offs"),
)
def _decode_multiscan_device(plans, geom, words_tup, nbits_tup, qtables,
                             steps_tup, blocks_tup, offs):
    """Multi-scan frame decode in ONE device program.

    Each scan (interleaved or Ns=1 non-interleaved, decoder.c:274-302)
    runs the lockstep engine over its own restart-segment lanes; scan
    coefficients drop into their slice of the concatenated-planes buffer
    (scans cover whole components, so slices are disjoint), and the
    dense pipeline runs once over the assembled frame.  XLA is free to
    overlap the independent scan programs.
    """
    total_blocks = sum(c.n_blocks for c in geom.components)
    coeffs = jnp.zeros((total_blocks, 64), jnp.int32)
    starved = jnp.asarray(False)
    for plan, words, nbits, steps, nb, off in zip(
        plans, words_tup, nbits_tup, steps_tup, blocks_tup, offs
    ):
        _, c_i, st = decode_scan_device(plan, words, nbits, steps, nb)
        coeffs = jax.lax.dynamic_update_slice(coeffs, c_i, (off, 0))
        starved = starved | st
    px = _dense_from_coeffs(coeffs[None], geom, qtables)
    return px[0], starved


def decode_frame_device(data: bytes):
    """One JPEG (any scan structure the engines support) -> device pixels.

    The single-frame device-ingestion entry: multi-scan non-interleaved
    files (decoder.c:274-302) run every scan's lockstep decode AND the
    dense stage in one compiled program -- the round-3 answer to "every
    component re-designed tpu-first" for the last host-only decode
    route.  Raises UnsupportedError for streams the device engines
    reject (bpm > 16 plans); callers fall back to decode_jpeg.
    """
    from ..api import _derive_cached

    cs = parse_codestream(data)
    geom = cs.geometry
    if geom is None or not cs.scans:
        raise UnsupportedError("no decodable frame")
    comp_off = {}
    off = 0
    for c in geom.components:
        comp_off[c.cid] = off
        off += c.n_blocks
    plans, words_l, nbits_l, steps_l, blocks_l, offs = [], [], [], [], [], []
    from ..entropy.lockstep_jax import (
        _max_steps_for, _segments_to_words,
    )

    for scan in cs.scans:
        tables = {k: _derive_cached(s) for k, s in scan.htables.items()}
        plan = _cached_plan(
            geom, scan.info,
            tuple(sorted((k, t.spec) for k, t in tables.items())),
        )
        if plan.blocks_per_mcu > 16:
            raise UnsupportedError(
                "scan's blocks/MCU exceeds the device engine's packing"
            )
        segments = [unstuff(data[s:e]) for s, e in scan.ecs_ranges]
        words, nbits = _segments_to_words(segments)
        plans.append(plan)
        words_l.append(jnp.asarray(words))
        nbits_l.append(jnp.asarray(nbits, dtype=jnp.int32))
        # Hard step bound: single dispatch, no starvation retry ladder
        # (single-frame latency path).
        steps_l.append(_max_steps_for(nbits, plan, scan.ri, optimistic=False))
        blocks_l.append(
            sum(geom.by_id(cid).n_blocks for cid in scan.info.component_ids)
        )
        offs.append(comp_off[scan.info.component_ids[0]])
    px, _ = _decode_multiscan_device(
        tuple(plans), geom, tuple(words_l), tuple(nbits_l),
        jnp.asarray(cs.qtables.astype(np.int32)), tuple(steps_l),
        tuple(blocks_l), tuple(offs),
    )
    return px


def decode_stream_rstless(parts: Sequence[bytes], lanes: int = 1024):
    """RST-less MJPEG frames -> device-resident pixel batch [F, H, W, C].

    ALL frames' speculative chunks ride ONE probe/match dispatch and one
    final decode (entropy/speculative._speculative_core_batch), then the
    dense pipeline runs over the whole batch -- the round-3 batched form
    of ``decode_frame_rstless`` (the reference decodes such streams
    strictly serially, decoder.c:364-388).  Raises UnsupportedError when
    the batch defeats speculative resolution or frames don't share the
    stream's geometry/tables.
    """
    from ..api import _derive_cached
    from ..entropy.speculative import _speculative_core_batch

    cs0 = parse_codestream(parts[0])
    geom = cs0.geometry
    if geom is None or len(cs0.scans) != 1:
        raise UnsupportedError("stream decode wants single-scan frames")
    scan0 = cs0.scans[0]
    key0 = tuple(sorted(scan0.htables.items()))
    segments = []
    for p in parts:
        cs = parse_codestream(p)
        if (
            cs.geometry != geom
            or len(cs.scans) != 1
            or len(cs.scans[0].ecs_ranges) != 1
            or tuple(sorted(cs.scans[0].htables.items())) != key0
        ):
            raise UnsupportedError("mixed stream; decode per frame")
        s, e = cs.scans[0].ecs_ranges[0]
        segments.append(unstuff(p[s:e]))
    tables = {k: _derive_cached(s) for k, s in scan0.htables.items()}
    res = _speculative_core_batch(
        geom, scan0.info, tables, segments, lanes=lanes
    )
    if res is None:
        raise UnsupportedError(
            "speculative resolution failed; decode frames on the host"
        )
    coeffs, _ = res
    total_blocks = sum(c.n_blocks for c in geom.components)
    qts = jnp.asarray(cs0.qtables.astype(np.int32))
    return _dense_only(
        geom, coeffs.reshape(len(parts), total_blocks, 64), qts
    )


def decode_frame_rstless(data: bytes, lanes: int = 1024):
    """One RST-LESS JPEG -> device-resident pixels [H, W, C].

    The speculative chunked entropy decode (entropy/speculative.py) and
    the dense pipeline both run on the accelerator; only the compressed
    stream goes up the wire and the pixels stay in HBM.  This is the
    device-ingestion analog of DeviceDecoder for streams WITHOUT restart
    markers (the reference decodes these strictly serially,
    decoder.c:364-388).  Raises UnsupportedError when the stream defeats
    speculative resolution -- fall back to ``decode_jpeg`` (host).
    """
    from ..api import _derive_cached
    from ..entropy.speculative import _speculative_core

    cs = parse_codestream(data)
    geom = cs.geometry
    if geom is None or len(cs.scans) != 1:
        raise UnsupportedError("decode_frame_rstless wants one frame/scan")
    scan = cs.scans[0]
    if len(scan.ecs_ranges) != 1:
        raise UnsupportedError(
            "stream has restart markers; use DeviceDecoder instead"
        )
    tables = {k: _derive_cached(s) for k, s in scan.htables.items()}
    seg = unstuff(data[scan.ecs_ranges[0][0] : scan.ecs_ranges[0][1]])
    res = _speculative_core(geom, scan.info, tables, seg, lanes)
    if res is None:
        raise UnsupportedError(
            "speculative resolution failed (corrupt or pathological "
            "stream); decode on the host with decode_jpeg"
        )
    coeffs, _ = res
    qts = jnp.asarray(cs.qtables.astype(np.int32))
    return _dense_only(geom, coeffs[None], qts)[0]
