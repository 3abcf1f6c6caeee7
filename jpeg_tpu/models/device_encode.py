"""Full on-device JPEG encode: pixel frames in, compressed bytes out.

The mirror of ``device_decode.DeviceDecoder`` and the deployment shape
for TPU egress: frames that already live in HBM (model outputs, decoded
video) compress on the chip -- color convert -> box downsample -> FDCT ->
quantize -> zig-zag/differential-DC -> device entropy encode
(entropy.encode_jax.encode_scan_device3) -- and only the packed segment
words (~compressed size) come back to the host, which finishes with the
byte-serial work: 1-padding flush, 0xFF byte stuffing, marker assembly
(all vectorized numpy over the whole batch).

One jitted executable per (geometry, quality, batch shape); frames of a
stream share those, so a whole batch encodes in a single call.  Output is
byte-identical to ``encode_jpeg`` with the same parameters
(default/MJPEG tables, optimize=False -- the streaming shape; per-image
optimized tables remain the per-frame ``encode_jpeg`` path).

Reference semantics covered here: libjpeg-compatible quality scaling
(encoder.c:38-65), K.1 base tables (encoder.c:14-34), edge-replication
padding (frame.c:277-350), box chroma downsample (frame.c:84-132),
differential DC with per-restart-interval reset (encoder.c:442-456,
decoder.c:371-373), RST0..7 cycling (encoder.c write_ecs path).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    DEFAULT_HTABLES,
    STD_CHROMINANCE_QUANT,
    STD_LUMINANCE_QUANT,
    ZIGZAG,
    scale_qtable,
)
from ..encoder import EncodeParams, geometry_for_image
from ..entropy.encode import build_visit_order
from ..entropy.encode_jax import encode_scan_device3
from ..errors import UnsupportedError
from ..format import emit
from ..geometry import FrameGeometry, ScanInfo
from ..models.batch import encode_plane_batch
from ..ops.color import rgb_to_ycc
from ..ops.resample import downsample_box
from ..tables import HuffSpec, derive_table


@dataclass
class _Shape:
    components: int
    precision: int
    height: int
    width: int


def _pixels_to_zz(pixels, qtables, prev_idx, geom: FrameGeometry):
    """Dense encode stage: [F, H, W, C] pixels -> [F * Bf, 64] zig-zag
    blocks in NATURAL (component-major raster) order with differential
    DC applied -- exactly the input shape of encode_scan_device3."""
    f = pixels.shape[0]
    x = pixels.astype(jnp.float32)
    pad_y = geom.size_y - geom.height
    pad_x = geom.size_x - geom.width
    if pad_y or pad_x:
        x = jnp.pad(x, ((0, 0), (0, pad_y), (0, pad_x), (0, 0)), mode="edge")

    comps = sorted(geom.components, key=lambda c: c.cid)
    if len(comps) == 3:
        ycc = rgb_to_ycc(x, geom.precision, exact=False)
        if pad_y or pad_x:
            # Reference quirk (frame_to_ycc, frame.c:162-163): color
            # conversion only touches the true [height, width] window;
            # the MCU padding keeps raw replicated RGB into the DCT.
            in_y = jnp.arange(geom.size_y)[:, None] < geom.height
            in_x = jnp.arange(geom.size_x)[None, :] < geom.width
            ycc = jnp.where((in_y & in_x)[None, :, :, None], ycc, x)
        chans = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
    else:
        chans = [x[..., 0]]

    parts = []
    for comp, chan in zip(comps, chans):
        sy = geom.size_y // (comp.b_y * 8)
        sx = geom.size_x // (comp.b_x * 8)
        if sy > 1 or sx > 1:
            chan = downsample_box(chan, sy, sx)
        qt = qtables[0] if comp.tq == 0 else qtables[1]
        parts.append(encode_plane_batch(chan, qt, geom.precision, exact=False))
    allz = jnp.concatenate(parts, axis=1)  # [F, Btot, 64] raster blocks

    # Blocks stay in natural (component-major raster) order: the entropy
    # stage takes the bitstream order as an index vector, so no [.., 64]
    # visit-order gather is ever materialized.  prev_idx here maps natural
    # row -> natural row of the previous same-component block within the
    # restart interval (-1 at interval starts).
    zz = allz[:, :, ZIGZAG]
    dc = zz[:, :, 0]
    prev = jnp.where(
        (prev_idx >= 0)[None, :],
        jnp.take(dc, jnp.clip(prev_idx, 0, None), axis=1),
        0,
    )
    zz = jnp.concatenate([(dc - prev)[:, :, None], zz[:, :, 1:]], axis=2)
    return zz.reshape(f * zz.shape[1], 64)


def _entropy_tail(
    zzf, visit_src, dc_tab, ac_tab, seg_of, ehufco, ehufsi,
    frames: int, n_segments: int, words_per_seg: int, icap: int,
    nz_cap: int, wpb_cap: int, with_hist: bool, phases: tuple,
    with_nsym_hist: bool,
):
    """Entropy stage: natural-order zig-zag blocks -> packed segments."""
    bf = zzf.shape[0] // frames
    tile = lambda a: jnp.tile(a, frames)  # noqa: E731
    seg_f = tile(seg_of) + (
        jnp.repeat(jnp.arange(frames, dtype=jnp.int32), bf) * n_segments
    )
    order_f = tile(visit_src) + (
        jnp.repeat(jnp.arange(frames, dtype=jnp.int32), bf) * bf
    )
    return encode_scan_device3(
        zzf,
        tile(dc_tab),
        tile(ac_tab),
        ehufco,
        ehufsi,
        seg_f,
        frames * n_segments,
        words_per_seg,
        icap,
        order=order_f,
        nz_cap=nz_cap,
        wpb_cap=wpb_cap,
        with_hist=with_hist,
        phases=phases,
        with_nsym_hist=with_nsym_hist,
    )


@partial(
    jax.jit,
    static_argnames=(
        "geom", "ri", "frames", "n_segments", "words_per_seg", "icap",
        "nz_cap", "wpb_cap", "with_hist", "phases", "with_nsym_hist",
    ),
)
def _encode_device(
    pixels,  # [F, H, W, C] uint8/uint16
    qtables,  # [2, 64] int32 (luma, chroma)
    visit_src,  # [Bf] int32: visit order -> row in concat(planes)
    prev_idx,  # [Bf] int32: previous same-component block in segment, -1
    dc_tab,  # [Bf] int32, NATURAL (component-major) order
    ac_tab,  # [Bf] int32, natural order
    seg_of,  # [Bf] int32, bitstream (visit) order
    ehufco,  # [T, 256] int32
    ehufsi,  # [T, 256] int32
    geom: FrameGeometry,
    ri: int,
    frames: int,
    n_segments: int,  # per frame
    words_per_seg: int,
    icap: int,
    nz_cap: int = 16,
    wpb_cap: int = 2,
    with_hist: bool = False,
    phases: tuple = (),
    with_nsym_hist: bool = False,
):
    zzf = _pixels_to_zz(pixels, qtables, prev_idx, geom)
    return _entropy_tail(
        zzf, visit_src, dc_tab, ac_tab, seg_of, ehufco, ehufsi,
        frames, n_segments, words_per_seg, icap, nz_cap, wpb_cap,
        with_hist, phases, with_nsym_hist,
    )


@partial(jax.jit, static_argnames=("geom", "frames", "n_tables"))
def _dense_hist_device(
    pixels, qtables, prev_idx, dc_tab, ac_tab,
    geom: FrameGeometry, frames: int, n_tables: int,
):
    """optimize=True pass 1: dense encode + dry-pass histogram, NO
    entropy packing (write_ecs_dry semantics, encoder.c:525-558).
    Returns (zzf, hist) -- zzf stays in HBM so pass 2 re-packs the SAME
    quantized blocks instead of re-running color/DCT/quant from pixels.
    """
    from ..entropy.encode_jax import hist_from_blocks

    zzf = _pixels_to_zz(pixels, qtables, prev_idx, geom)
    hist = hist_from_blocks(
        zzf, jnp.tile(dc_tab, frames), jnp.tile(ac_tab, frames), n_tables
    )
    return zzf, hist


@partial(
    jax.jit,
    static_argnames=(
        "frames", "n_segments", "words_per_seg", "icap",
        "nz_cap", "wpb_cap", "phases", "with_nsym_hist",
    ),
)
def _entropy_only_device(
    zzf, visit_src, dc_tab, ac_tab, seg_of, ehufco, ehufsi,
    frames: int, n_segments: int, words_per_seg: int, icap: int,
    nz_cap: int, wpb_cap: int, phases: tuple = (),
    with_nsym_hist: bool = False,
):
    """optimize=True pass 2: re-pack HBM-resident quantized blocks with
    the traded-in tables (write_ecs after write_ecs_dry)."""
    return _entropy_tail(
        zzf, visit_src, dc_tab, ac_tab, seg_of, ehufco, ehufsi,
        frames, n_segments, words_per_seg, icap, nz_cap, wpb_cap,
        False, phases, with_nsym_hist,
    )


@partial(jax.jit, static_argnames=("tw_cap",))
def _compact_segment_words(words, seg_bits, tw_cap: int):
    """[nseg, wps] padded rows -> tight flat word stream (+ total).

    The device->host pull then moves ~the compressed size instead of the
    padded matrix (the dev tunnel here is ~25 MB/s; even on PCIe it's
    free bandwidth).  Inverse map = one nseg-attempt mark scatter +
    cumsum; a single flat gather reads the live words.
    """
    nseg, wps = words.shape
    nw = (seg_bits + 31) >> 5  # words used per segment
    base = jnp.cumsum(nw) - nw
    total = base[-1] + nw[-1]
    mark = jnp.zeros(tw_cap, jnp.int32).at[base].add(1, mode="drop")
    it = jnp.arange(tw_cap, dtype=jnp.int32)
    s_of = jnp.clip(jnp.cumsum(mark) - 1, 0, nseg - 1)
    startp = jax.lax.cummax(jnp.where(mark > 0, it, 0))
    k = it - startp
    valid = it < total
    flat = jnp.take(
        words.reshape(-1),
        s_of * wps + jnp.clip(k, 0, wps - 1),
        mode="clip",
    )
    return jnp.where(valid, flat, jnp.uint32(0)), total


def _build_header(geom, qtables, specs, ri, info) -> bytes:
    """SOI..SOS marker bytes for the given qtables/Huffman specs."""
    hdr = bytearray()
    hdr += emit.emit_soi()
    hdr += emit.emit_dqt(qtables[0].astype(np.uint16), 0)
    if geom.nf > 1:
        hdr += emit.emit_dqt(qtables[1].astype(np.uint16), 1)
    hdr += emit.emit_sof0(geom)
    hdr += emit.emit_dht(specs[(0, 0)], 0, 0)
    hdr += emit.emit_dht(specs[(1, 0)], 1, 0)
    if geom.nf > 1:
        hdr += emit.emit_dht(specs[(0, 1)], 0, 1)
        hdr += emit.emit_dht(specs[(1, 1)], 1, 1)
    hdr += emit.emit_dri(ri)
    hdr += emit.emit_sos(info)
    return bytes(hdr)


@dataclass
class DeviceEncoder:
    """Compiled whole-batch encoder for frames sharing one geometry.

    Build once with ``for_config`` (or ``for_frame`` from a sample array),
    then ``encode_batch`` a [F, H, W, C] pixel batch -> list of JPEG byte
    strings.  Streaming shape: default (MJPEG) Huffman tables, restart
    markers every ``restart_interval`` MCUs (so the output is itself
    parallel-decodable by DeviceDecoder).
    """

    geom: FrameGeometry
    info: ScanInfo
    ri: int
    n_segments: int
    qtables: np.ndarray  # [2, 64] int32
    header: bytes
    visit_src: np.ndarray
    prev_idx: np.ndarray
    dc_tab: np.ndarray  # [Bf] natural (component-major) order
    ac_tab: np.ndarray  # [Bf] natural order
    seg_of: np.ndarray  # [Bf] bitstream (visit) order
    ehufco: np.ndarray
    ehufsi: np.ndarray
    words_per_seg: int  # sticky; grows on overflow bit1
    words_per_seg_max: int = 0  # worst-case bound (hard cap for growth)
    items_per_block: int = 12  # sticky per-block item-slot cap (icap)
    nz_cap: int = 16  # sticky per-block nonzero bound
    wpb_cap: int = 2  # sticky compact-words-per-block capacity
    tw_per_seg: int = 0  # sticky transfer-compaction words/segment (0=auto)
    table_keys: tuple = ()  # (class, id) per stacked code-table row
    nsym_counts: Optional[np.ndarray] = None  # learned [70] histogram of
    #   per-block symbol counts (first chunk of the stream); drives the
    #   phased slot-scan schedule the way DeviceDecoder.lane_steps drives
    #   the decode lane narrowing
    _sched_cache: dict = dc_field(default_factory=dict)  # B -> phases

    @staticmethod
    def for_config(
        height: int,
        width: int,
        components: int = 3,
        params: Optional[EncodeParams] = None,
        htables: Optional[dict] = None,
        precision: int = 8,
    ) -> "DeviceEncoder":
        """Build the compiled stream encoder.

        ``htables`` optionally supplies fixed Huffman table specs
        ({(class, id): HuffSpec}) shared by every frame -- e.g. tables
        optimized on a representative frame (``tables_for_stream``), the
        MJPEG streaming analog of the reference's per-image two-pass
        optimizer.  Default: the implicit Annex K.3 (MJPEG) tables.
        """
        params = params or EncodeParams(h=2, v=2, optimize=False, exact=False)
        if params.optimize:
            raise UnsupportedError(
                "DeviceEncoder streams with shared tables; pass per-stream "
                "optimized specs via htables= (see tables_for_stream) or "
                "use encode_jpeg for per-image optimized tables"
            )
        if not params.restart_interval:
            raise UnsupportedError(
                "DeviceEncoder needs a restart interval (the parallel axis)"
            )
        geom = geometry_for_image(
            _Shape(components, precision, height, width),  # type: ignore[arg-type]
            params,
        )
        comps = sorted(geom.components, key=lambda c: c.cid)
        info = ScanInfo(
            component_ids=tuple(c.cid for c in comps),
            td=tuple(c.td for c in comps),
            ta=tuple(c.ta for c in comps),
        )
        ri = params.restart_interval
        comp_idx, block_seq = build_visit_order(geom, info)
        offsets = np.zeros(len(comps), np.int64)
        off = 0
        for j, c in enumerate(comps):
            offsets[j] = off
            off += c.n_blocks
        visit_src = offsets[comp_idx] + block_seq

        bpm = comp_idx.size // geom.n_mcus if info.ns > 1 else (
            comps[0].h * comps[0].v
        )
        mcu_of = np.arange(comp_idx.size) // bpm
        seg_of = mcu_of // ri
        n_segments = int(seg_of.max()) + 1

        # Previous same-component block within the restart interval, as a
        # NATURAL-row -> NATURAL-row map (the DC prediction chain runs in
        # visit order; rows stay component-major on device).
        prev_visit = np.full(comp_idx.size, -1, np.int64)
        for j in range(len(comps)):
            sel = np.nonzero(comp_idx == j)[0]
            same_seg = seg_of[sel][1:] == seg_of[sel][:-1]
            prev_visit[sel[1:][same_seg]] = sel[:-1][same_seg]
        prev_idx = np.full(comp_idx.size, -1, np.int64)
        prev_idx[visit_src] = np.where(
            prev_visit >= 0, visit_src[np.clip(prev_visit, 0, None)], -1
        )

        keys: List[Tuple[int, int]] = []
        for td in info.td:
            if (0, td) not in keys:
                keys.append((0, td))
        for ta in info.ta:
            if (1, ta) not in keys:
                keys.append((1, ta))
        specs = {k: HuffSpec.from_pair(v) for k, v in DEFAULT_HTABLES.items()}
        if htables:
            specs.update(htables)
        tables = {k: derive_table(specs[k]) for k in keys}
        tmap = {k: i for i, k in enumerate(keys)}
        ehufco = np.stack([tables[k].ehufco for k in keys]).astype(np.int32)
        ehufsi = np.stack([tables[k].ehufsi for k in keys]).astype(np.int32)
        td_arr = np.asarray([tmap[(0, info.td[j])] for j in range(info.ns)])
        ta_arr = np.asarray([tmap[(1, info.ta[j])] for j in range(info.ns)])

        qtables = np.ones((2, 64), dtype=np.int32)
        qtables[0] = scale_qtable(STD_LUMINANCE_QUANT, params.quality)
        qtables[1] = scale_qtable(STD_CHROMINANCE_QUANT, params.quality)

        hdr = _build_header(geom, qtables, specs, ri, info)

        max_blocks_per_seg = int(np.bincount(seg_of).max())
        # Natural-order table ids for the v3 block-lane entropy engine.
        dc_nat = np.empty(comp_idx.size, np.int32)
        ac_nat = np.empty(comp_idx.size, np.int32)
        dc_nat[visit_src] = td_arr[comp_idx]
        ac_nat[visit_src] = ta_arr[comp_idx]
        # Sticky segment-row width: ~44 bits/block covers photographic
        # content with margin; grows (x2, capped at worst case) on
        # overflow.  The worst case (68 slots x 31 bits) would make the
        # output buffer ~15x larger than ever needed.
        wps_max = (max_blocks_per_seg * 68 * 31) // 32 + 2
        wps = min(wps_max, max_blocks_per_seg * 44 // 32 + 4)
        return DeviceEncoder(
            geom=geom,
            info=info,
            ri=ri,
            n_segments=n_segments,
            qtables=qtables,
            header=hdr,
            visit_src=visit_src.astype(np.int32),
            prev_idx=prev_idx.astype(np.int32),
            dc_tab=dc_nat,
            ac_tab=ac_nat,
            seg_of=seg_of.astype(np.int32),
            ehufco=ehufco,
            ehufsi=ehufsi,
            words_per_seg=wps,
            words_per_seg_max=wps_max,
            table_keys=tuple(keys),
        )

    @staticmethod
    def tables_for_stream(sample_pnm: bytes, params: EncodeParams) -> dict:
        """Optimize Huffman tables on a representative frame (host
        two-pass, Annex K.2) for use as a stream's fixed ``htables`` --
        smaller output than the MJPEG defaults at zero per-frame cost."""
        from ..encoder import geometry_for_image
        from ..entropy.encode import histogram, symbolize_scan
        from ..models.pipeline import encode_frame
        from ..tables import optimize_table
        from ..utils.pnm import read_pnm

        probe = read_pnm(sample_pnm)
        geom = geometry_for_image(probe, params)
        img = read_pnm(sample_pnm, pad_to=(8 * geom.max_v, 8 * geom.max_h))
        qtables = np.ones((4, 64), dtype=np.int32)
        qtables[0] = scale_qtable(STD_LUMINANCE_QUANT, params.quality)
        qtables[1] = scale_qtable(STD_CHROMINANCE_QUANT, params.quality)
        planes = encode_frame(img.data, geom, qtables, exact=False)
        planes = {cid: np.asarray(p) for cid, p in planes.items()}
        comps = sorted(geom.components, key=lambda c: c.cid)
        info = ScanInfo(
            component_ids=tuple(c.cid for c in comps),
            td=tuple(c.td for c in comps),
            ta=tuple(c.ta for c in comps),
        )
        symbols = symbolize_scan(planes, geom, info, params.restart_interval)
        # Seed every symbol later frames could legally need (the sample
        # frame may not exercise them): DC categories up to 11 (8-bit) /
        # 15 (12-bit), AC EOB/ZRL and (run, size) up to size 10/14 --
        # the baseline symbol sets per T.81.  Negligible code-length
        # cost, total robustness for the fixed-table stream.
        dc_cats = 12 if probe.precision <= 8 else 16
        ac_size = 10 if probe.precision <= 8 else 14
        out = {}
        for k, counts in histogram(symbols).items():
            counts = counts.copy()
            if k[0] == 0:
                counts[:dc_cats] += 1
            else:
                counts[0x00] += 1
                counts[0xF0] += 1
                for r in range(16):
                    for s in range(1, ac_size + 1):
                        counts[(r << 4) | s] += 1
            out[k] = optimize_table(counts)
        return out

    def encode_batch(
        self, pixels, optimize: bool = False, chunk: int = 8
    ) -> List[bytes]:
        """[F, H, W, C] uint8 (numpy or device-resident) -> JPEG bytes.

        ``optimize=True`` runs the two-pass Annex-K.2 optimization fully
        on the accelerator: pass 1 reduces the batch's symbol histogram
        with one MXU matmul (the psum analog of write_ecs_dry,
        encoder.c:525-558), the host derives per-BATCH optimal tables,
        pass 2 re-encodes -- the code tables are traced inputs, so both
        passes reuse compiled executables.
        """
        frames = int(pixels.shape[0])
        if pixels.ndim != 4:
            raise UnsupportedError("encode_batch wants [F, H, W, C]")
        from ..utils.metrics import default_metrics

        with default_metrics.stage(
            "device_encode.batch",
            items=frames * self.geom.height * self.geom.width,
        ):
            return self._encode_batch_inner(pixels, frames, optimize, chunk)

    def _slot_phases(self, frames: int) -> tuple:
        """Phased slot-scan schedule for a ``frames``-frame chunk.

        Built from the LEARNED per-block symbol-count histogram (first
        chunk of the stream; content statistics repeat across frames):
        geometric row cuts, each phase's cumulative slot budget = the
        max n_sym among the rows it retires + slack.  The engine sorts
        blocks by TRUE n_sym on device, so the schedule only has to
        match the distribution, not per-block predictions; drift past a
        budget trips overflow bit 0 and the chunk redoes flat while the
        histogram relearns.  () until learned.
        """
        if self.nsym_counts is None:
            return ()
        B = frames * int(self.visit_src.size)
        cached = self._sched_cache.get(B)
        if cached is not None:
            return cached
        counts = np.asarray(self.nsym_counts, np.int64)
        # desc_cum[k] = how many blocks have n_sym >= k
        desc_cum = np.cumsum(counts[::-1])[::-1]
        total = max(int(counts.sum()), 1)

        def nsym_at(pos_frac: float) -> int:
            # n_sym at descending rank floor(pos_frac * B)
            target = pos_frac * total
            ks = np.nonzero(desc_cum > target)[0]
            return int(ks.max()) if ks.size else 1

        rows = [B]
        for d in (1.5, 2.2, 3.3, 5.0, 8.0, 14.0, 28.0, 64.0):
            r = max(256, int(B / d) // 128 * 128)
            if r < rows[-1]:
                rows.append(r)
        phases, prev_cap = [], 1
        for i, r in enumerate(rows):
            nxt = rows[i + 1] if i + 1 < len(rows) else 0
            cap = min(68, max(nsym_at(nxt / B) + 2, prev_cap))
            phases.append((r, cap - prev_cap))
            prev_cap = cap
        sched = tuple(phases)
        self._sched_cache[B] = sched
        return sched

    def _dispatch(self, pixels, frames: int, ehufco, ehufsi, with_hist: bool):
        """Queue one device encode (async) with the CURRENT capacities.

        While the n_sym histogram is unlearned the dispatch runs flat
        and asks for the histogram; the caller materializes it via
        ``_learn_nsym`` (the first chunk's ``_run`` is synchronous)."""
        want_nsym = self.nsym_counts is None
        self._last_phased = not want_nsym and bool(self._slot_phases(frames))
        res = _encode_device(
            jnp.asarray(pixels),
            jnp.asarray(self.qtables),
            jnp.asarray(self.visit_src),
            jnp.asarray(self.prev_idx),
            jnp.asarray(self.dc_tab),
            jnp.asarray(self.ac_tab),
            jnp.asarray(self.seg_of),
            jnp.asarray(ehufco),
            jnp.asarray(ehufsi),
            self.geom,
            self.ri,
            frames,
            self.n_segments,
            self.words_per_seg,
            self.items_per_block,
            self.nz_cap,
            self.wpb_cap,
            with_hist,
            self._slot_phases(frames) if not want_nsym else (),
            want_nsym,
        )
        if want_nsym:
            self._pending_nsym = res[-1]
            res = res[:-1]
        return res

    def _learn_nsym(self) -> None:
        """Fold a pending n_sym histogram into the learned schedule."""
        pend = getattr(self, "_pending_nsym", None)
        if pend is not None:
            counts = np.asarray(pend)
            if self.nsym_counts is None:
                self.nsym_counts = counts
                self._sched_cache.clear()
            self._pending_nsym = None

    def _grow(self, code: int) -> bool:
        """Grow the sticky capacity the overflow code points at."""
        grew = False
        if code & 0b0001 and getattr(self, "_last_phased", False):
            # A phased chunk outran the learned budgets (content drift):
            # drop the schedule and relearn from this chunk's flat redo
            # instead of doubling icap.
            from ..utils.metrics import default_metrics

            default_metrics.count("device_encode.phase_relearns")
            self.nsym_counts = None
            self._sched_cache.clear()
            grew = True
        elif code & 0b0001 and self.items_per_block < 68:
            self.items_per_block = min(68, self.items_per_block * 2)
            grew = True
        if code & 0b0010 and self.words_per_seg < self.words_per_seg_max:
            self.words_per_seg = min(
                self.words_per_seg_max, self.words_per_seg * 2
            )
            grew = True
        if code & 0b0100 and self.nz_cap < 63:
            self.nz_cap = min(63, self.nz_cap * 2)
            grew = True
        if code & 0b1000 and self.wpb_cap < 70:
            self.wpb_cap = min(70, self.wpb_cap * 2)
            grew = True
        return grew

    def _dispatch_zz(self, zzf, frames: int, ehufco, ehufsi):
        """Queue one entropy-only device encode (async) over HBM-resident
        quantized blocks -- the optimize=True pass 2 (no dense redo)."""
        want_nsym = self.nsym_counts is None
        self._last_phased = not want_nsym and bool(self._slot_phases(frames))
        res = _entropy_only_device(
            zzf,
            jnp.asarray(self.visit_src),
            jnp.asarray(self.dc_tab),
            jnp.asarray(self.ac_tab),
            jnp.asarray(self.seg_of),
            jnp.asarray(ehufco),
            jnp.asarray(ehufsi),
            frames,
            self.n_segments,
            self.words_per_seg,
            self.items_per_block,
            self.nz_cap,
            self.wpb_cap,
            self._slot_phases(frames) if not want_nsym else (),
            want_nsym,
        )
        if want_nsym:
            self._pending_nsym = res[-1]
            res = res[:-1]
        return res

    def _run(self, pixels, frames: int, ehufco, ehufsi, with_hist: bool,
             zzf=None):
        """One device encode with the sticky-capacity retry loop.
        ``zzf`` switches to the entropy-only path (optimize pass 2)."""
        from ..utils.metrics import default_metrics

        while True:
            if zzf is not None:
                res = self._dispatch_zz(zzf, frames, ehufco, ehufsi)
            else:
                res = self._dispatch(
                    pixels, frames, ehufco, ehufsi, with_hist
                )
            code = int(res[2])
            self._learn_nsym()  # n_sym is capacity-independent: the
            #                      histogram is valid even on overflow
            if not code:
                return res
            default_metrics.count("device_encode.cap_retries")
            if not self._grow(code):
                # A silent return here would ship corrupt segment words --
                # fail loudly instead (advisor finding, round 1).
                raise RuntimeError(
                    f"device encode overflow (code={code:#06b}) with all "
                    "capacities at maximum; segment words would be corrupt"
                )

    def _encode_batch_inner(
        self, pixels, frames: int, optimize: bool, chunk: int
    ) -> List[bytes]:
        """Chunked encode: the entropy stage materializes an
        [items, 256] one-hot (~300 MB/frame at 1080p), so big batches
        process in ``chunk``-frame pieces.  With optimize=True, chunk
        histograms SUM into the per-batch tables first (the all-reduce
        shape of write_ecs_dry), then every chunk encodes with them."""
        # encode_scan_device2 packs segment ids into 17 bits; cap the
        # chunk so frames*n_segments never wraps (e.g. 4K at ri=1).
        max_chunk = max(1, (1 << 17) // max(1, self.n_segments))
        chunk = min(chunk, max_chunk) if chunk > 0 else max_chunk
        if frames <= chunk:
            spans = [(0, frames)]
        else:
            spans = [(i, min(i + chunk, frames)) for i in range(0, frames, chunk)]
        ehufco, ehufsi, header = self.ehufco, self.ehufsi, self.header
        zz_chunks = None
        if optimize:
            from ..tables import optimize_table

            # Pass 1 (write_ecs_dry analog): dense encode + dry-pass
            # histogram only -- no entropy packing.  The quantized
            # blocks stay DEVICE-RESIDENT so pass 2 re-packs them with
            # the traded-in tables instead of re-running color/DCT/
            # quant/zig-zag from pixels (encoder.c:525-587 two-pass).
            # All chunks dispatch async; ONE sync pulls the summed hist.
            zz_chunks, hists = [], []
            pix_d = jnp.asarray(pixels)
            for lo, hi in spans:
                zzf, h = _dense_hist_device(
                    pix_d[lo:hi],
                    jnp.asarray(self.qtables),
                    jnp.asarray(self.prev_idx),
                    jnp.asarray(self.dc_tab),
                    jnp.asarray(self.ac_tab),
                    self.geom,
                    hi - lo,
                    len(self.table_keys),
                )
                zz_chunks.append(zzf)
                hists.append(h)
            hist = np.asarray(sum(hists[1:], hists[0]))
            specs = dict(
                (k, HuffSpec.from_pair(v)) for k, v in DEFAULT_HTABLES.items()
            )
            tables = {}
            for i, key in enumerate(self.table_keys):
                specs[key] = optimize_table(hist[i])
                tables[key] = derive_table(specs[key])
            ehufco = np.stack(
                [tables[k].ehufco for k in self.table_keys]
            ).astype(np.int32)
            ehufsi = np.stack(
                [tables[k].ehufsi for k in self.table_keys]
            ).astype(np.int32)
            header = _build_header(
                self.geom, self.qtables, specs, self.ri, self.info
            )
        # Pipelined drain: queue every chunk's device work up front (the
        # first chunk runs the sync retry loop so sticky capacities are
        # warm), start host copies async, then finalize in order -- the
        # host-side trim/stuff/assemble of chunk k overlaps the device
        # encode and transfer of chunks k+1....
        if not self.tw_per_seg:
            self.tw_per_seg = (max(8, self.words_per_seg * 3 // 4) + 7) // 8 * 8
        pending = []
        for ci, (lo, hi) in enumerate(spans):
            zzf = zz_chunks[ci] if zz_chunks is not None else None
            if not pending:
                res = self._run(
                    None if zzf is not None else pixels[lo:hi],
                    hi - lo, ehufco, ehufsi, False, zzf=zzf,
                )
            elif zzf is not None:
                res = self._dispatch_zz(zzf, hi - lo, ehufco, ehufsi)
            else:
                res = self._dispatch(
                    pixels[lo:hi], hi - lo, ehufco, ehufsi, False
                )
            # Device-side transfer compaction: pull ~compressed bytes,
            # not the padded row matrix.
            tw_cap = (hi - lo) * self.n_segments * self.tw_per_seg
            flat, total = _compact_segment_words(res[0], res[1], tw_cap)
            for a in (flat, res[1], total):
                try:
                    a.copy_to_host_async()
                except AttributeError:
                    pass
            pending.append((ci, lo, hi, res, flat, total, tw_cap))
        out: List[bytes] = []
        for ci, lo, hi, res, flat, total, tw_cap in pending:
            code = int(res[2])
            if code:
                # A later chunk overflowed capacities the first chunk's
                # content never reached: grow and re-run just this chunk.
                if not self._grow(code):
                    raise RuntimeError(
                        f"device encode overflow (code={code:#06b}) with "
                        "all capacities at maximum"
                    )
                zzf = zz_chunks[ci] if zz_chunks is not None else None
                res = self._run(
                    None if zzf is not None else pixels[lo:hi],
                    hi - lo, ehufco, ehufsi, False, zzf=zzf,
                )
                flat = total = None
            if bool(res[3]):
                raise UnsupportedError(
                    "a symbol has no code in the selected Huffman tables "
                    "(content exceeds table range; use optimize=True)"
                )
            seg_bits = np.asarray(res[1])
            total_h = 0 if total is None else int(total)
            if flat is not None and total_h <= tw_cap:
                flat_h = np.asarray(flat)
                out.extend(
                    self._finalize_flat(flat_h, seg_bits, hi - lo, header)
                )
            else:
                # Compaction capacity missed (or chunk re-ran): fall back
                # to the padded pull, and teach the sticky estimate.
                w_used = max(1, int((seg_bits.max() + 31) // 32))
                words_h = np.asarray(res[0])[:, :w_used]
                out.extend(self._finalize(words_h, seg_bits, hi - lo, header))
            nseg_c = (hi - lo) * self.n_segments
            need = -(-int(((seg_bits + 31) // 32).sum()) // nseg_c) + 2
            # quantize (multiples of 8) so the jit cache sees few sizes
            self.tw_per_seg = max(self.tw_per_seg, (need + 7) // 8 * 8)
        return out

    def _finalize(self, words: np.ndarray, seg_bits: np.ndarray, frames: int,
                  header: bytes = b""):
        """Vectorized host tail: trim, 1-pad, byte-stuff, assemble markers."""
        sg, w = words.shape
        arr = np.ascontiguousarray(words).byteswap().view(np.uint8).reshape(sg, w * 4)
        nbytes = (seg_bits + 7) // 8
        pad = nbytes * 8 - seg_bits
        rows = np.arange(sg)
        last = np.maximum(nbytes - 1, 0)
        padded_last = arr[rows, last] | ((1 << pad) - 1).astype(np.uint8)
        arr[rows, last] = np.where(nbytes > 0, padded_last, arr[rows, last])

        # One stuffing pass over every segment's live bytes.
        live = np.arange(w * 4)[None, :] < nbytes[:, None]
        flat = arr[live]  # concatenated trimmed segments
        return self._assemble(flat, nbytes, frames, header)

    def _finalize_flat(self, flat_words: np.ndarray, seg_bits: np.ndarray,
                       frames: int, header: bytes = b""):
        """_finalize for the device-compacted word stream (no padded
        matrix): per-segment live bytes come straight from word offsets."""
        nbytes = (seg_bits + 7) // 8
        nw = (seg_bits + 31) // 32
        base = np.cumsum(nw) - nw
        arr = np.ascontiguousarray(flat_words[: int(nw.sum())]).byteswap(
        ).view(np.uint8)
        if arr.size == 0:
            return self._assemble(arr, nbytes, frames, header)
        pad = nbytes * 8 - seg_bits
        lastpos = np.minimum(4 * base + np.maximum(nbytes - 1, 0),
                             arr.size - 1)
        padded_last = arr[lastpos] | ((1 << pad) - 1).astype(np.uint8)
        arr[lastpos] = np.where(nbytes > 0, padded_last, arr[lastpos])
        off = np.arange(arr.size) - np.repeat(4 * base, 4 * nw)
        live = off < np.repeat(nbytes, 4 * nw)
        return self._assemble(arr[live], nbytes, frames, header)

    def _assemble(self, flat: np.ndarray, nbytes: np.ndarray, frames: int,
                  header: bytes = b""):
        """Shared tail: byte-stuff the concatenated live segment bytes,
        then drop RSTn/EOI markers into the per-frame gaps."""
        ends = np.cumsum(nbytes)
        is_ff = flat == 0xFF
        out = np.zeros(flat.size + int(is_ff.sum()), dtype=np.uint8)
        dst = np.arange(flat.size) + np.cumsum(is_ff) - is_ff
        out[dst] = flat
        ffcum = np.concatenate(([0], np.cumsum(is_ff)))
        s_end = ends + ffcum[ends]  # stuffed end offset per segment
        s_start = np.concatenate(([0], s_end[:-1]))

        # Assemble each frame in one vectorized pass: every stuffed byte
        # shifts right by 2 per preceding in-frame segment boundary (the
        # RSTn marker), then the markers drop into the gaps.
        res: List[bytes] = []
        ns = self.n_segments
        hdr = np.frombuffer(header or self.header, np.uint8)
        for f in range(frames):
            seg_lens = s_end[f * ns:(f + 1) * ns] - s_start[f * ns:(f + 1) * ns]
            body = out[s_start[f * ns]:s_end[(f + 1) * ns - 1]]
            buf = np.empty(hdr.size + body.size + 2 * (ns - 1) + 2, np.uint8)
            buf[: hdr.size] = hdr
            shift = np.repeat(np.arange(ns, dtype=np.int64), seg_lens)
            buf[hdr.size + np.arange(body.size) + 2 * shift] = body
            gap = hdr.size + np.cumsum(seg_lens[:-1]) + 2 * np.arange(ns - 1)
            buf[gap] = 0xFF
            buf[gap + 1] = 0xD0 + (np.arange(ns - 1) & 7)
            buf[-2:] = (0xFF, 0xD9)
            res.append(buf.tobytes())
        return res
