"""Full on-device batch decoder vs the host pipeline (CPU backend)."""

import numpy as np
import pytest

import jpeg_tpu
from jpeg_tpu.encoder import EncodeParams, encode_jpeg
from jpeg_tpu.models.device_decode import DeviceDecoder
from refbin import ensure_reference_binaries, make_ppm, ref_decode

pytestmark = pytest.mark.skipif(
    ensure_reference_binaries() is None, reason="reference toolchain unavailable"
)


def test_device_batch_matches_host():
    params = EncodeParams(h=2, v=2, quality=80, restart_interval=2,
                          optimize=False, exact=False)  # MJPEG-style shared tables
    jpegs = [
        encode_jpeg(make_ppm(64, 48, seed=70 + i), params) for i in range(3)
    ]
    dec = DeviceDecoder.for_stream(jpegs[0])
    batch = np.asarray(dec.decode_batch(jpegs))
    assert batch.shape == (3, 48, 64, 3)
    assert batch.dtype == np.uint8
    for i, jpg in enumerate(jpegs):
        host = jpeg_tpu.decode_jpeg(jpg, exact=False).pixels().astype(np.uint8)
        # same fast path, different fusion: allow 1-count rounding slack
        diff = np.abs(batch[i].astype(int) - host.astype(int))
        assert diff.max() <= 1, diff.max()
        # and close to the reference decoder's exact output
        golden = jpeg_tpu.decode_jpeg(jpg, exact=True).pixels()
        assert np.abs(batch[i].astype(int) - golden.astype(int)).max() <= 1


def test_device_batch_gray():
    params = EncodeParams(h=1, v=1, quality=75, restart_interval=4,
                          optimize=False, exact=False)
    from refbin import make_pgm

    jpegs = [encode_jpeg(make_pgm(40, 40, seed=80 + i), params) for i in range(2)]
    dec = DeviceDecoder.for_stream(jpegs[0])
    batch = np.asarray(dec.decode_batch(jpegs))
    assert batch.shape == (2, 40, 40, 1)
    host = jpeg_tpu.decode_jpeg(jpegs[1], exact=True).pixels()
    assert np.abs(batch[1].astype(int) - host.astype(int)).max() <= 1


def test_native_flat_prep_matches_python_parser(monkeypatch):
    """The C++ single-pass prep and the Python parse/unstuff/pack path
    must produce identical lane content (and thus identical decodes)."""
    from jpeg_tpu import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    monkeypatch.setenv("JPEG_TPU_PREP", "flat")
    params = EncodeParams(h=2, v=2, quality=85, restart_interval=3,
                          optimize=False, exact=False)
    jpegs = [encode_jpeg(make_ppm(80, 64, seed=90 + i), params) for i in range(3)]
    dec = DeviceDecoder.for_stream(jpegs[0])
    fast = dec._prepare_native(jpegs)
    assert fast is not None and fast[0] == "flat"
    _, buf, starts, nbits_f, _ = fast
    hdr, dec.header = dec.header, b""  # force the Python parser
    slow = dec.prepare(jpegs)
    dec.header = hdr
    assert slow[0] == "mat"
    words = slow[1]
    assert (nbits_f == slow[3]).all()
    for lane in range(starts.size):
        nw = (int(nbits_f[lane]) // 8 + 3) // 4
        row_fast = buf[starts[lane] : starts[lane] + nw]
        np.testing.assert_array_equal(row_fast, words[lane, :nw], err_msg=f"lane {lane}")
    # frames whose header differs (different quality) must fall back
    other = encode_jpeg(make_ppm(80, 64, seed=1), EncodeParams(h=2, v=2, quality=50, restart_interval=3, optimize=False, exact=False))
    assert dec._prepare_native([jpegs[0], other]) is None


def test_device_batch_chunked_pipeline():
    params = EncodeParams(h=2, v=2, quality=75, restart_interval=2,
                          optimize=False, exact=False)
    jpegs = [encode_jpeg(make_ppm(64, 48, seed=100 + i), params) for i in range(5)]
    dec = DeviceDecoder.for_stream(jpegs[0])
    batch = np.asarray(dec.decode_batch(jpegs, chunk=2))  # ragged: 2+2+1
    assert batch.shape == (5, 48, 64, 3)
    for i, jpg in enumerate(jpegs):
        golden = jpeg_tpu.decode_jpeg(jpg, exact=True).pixels()
        assert np.abs(batch[i].astype(int) - golden.astype(int)).max() <= 1


def test_device_batch_12bit():
    # 12-bit needs optimized tables (the default tables lack the large DC
    # categories -- same limitation as the reference encoder); repeated
    # frames share the optimized tables, the batch-decoder contract.
    params = EncodeParams(h=2, v=1, quality=85, restart_interval=2,
                          optimize=True, exact=False)
    one = encode_jpeg(make_ppm(48, 32, seed=110, maxval=4095), params)
    jpegs = [one, one]
    dec = DeviceDecoder.for_stream(jpegs[0])
    batch = np.asarray(dec.decode_batch(jpegs))
    assert batch.dtype == np.uint16
    for i, jpg in enumerate(jpegs):
        golden = jpeg_tpu.decode_jpeg(jpg, exact=True).pixels()
        assert np.abs(batch[i].astype(int) - golden.astype(int)).max() <= 1


def test_device_batch_starve_retry():
    """An undersized step bound must starve, retry, and learn."""
    params = EncodeParams(h=2, v=2, quality=90, restart_interval=8,
                          optimize=False, exact=False)
    jpegs = [encode_jpeg(make_ppm(64, 48, seed=120 + i), params) for i in range(2)]
    dec = DeviceDecoder.for_stream(jpegs[0])
    dec.max_steps = 128  # far below what q90 ri=8 content needs
    batch = np.asarray(dec.decode_batch(jpegs))
    assert dec.max_steps > 128  # grew and stuck
    for i, jpg in enumerate(jpegs):
        golden = jpeg_tpu.decode_jpeg(jpg, exact=True).pixels()
        assert np.abs(batch[i].astype(int) - golden.astype(int)).max() <= 1


def test_learned_phased_scan_matches_classic(monkeypatch):
    """Second decode_batch of a stream runs the phased narrowed scan
    (lanes sorted by learned per-segment step counts); output must match
    the classic path bit-for-bit and the reference within +-1."""
    monkeypatch.setenv("JPEG_TPU_PREP", "rows")
    params = EncodeParams(h=2, v=2, quality=80, restart_interval=1,
                          optimize=False, exact=False)
    jpegs = [
        encode_jpeg(make_ppm(160, 120, seed=200 + i), params)
        for i in range(6)
    ]
    dec = DeviceDecoder.for_stream(jpegs[0])
    first = np.asarray(dec.decode_batch(jpegs, chunk=3))  # learns
    assert dec.lane_steps is not None and dec.sort_order is not None
    prepared = dec.prepare(jpegs[:3])
    assert prepared[0] == "mats"  # sorted rows + phased scan engaged
    # Uniform synthetic content learns near-identical bounds (the
    # schedule rightly collapses to one phase); inflate the top half --
    # budgets only grow, so correctness is unaffected -- to force a
    # genuine multi-phase narrowing through the engine.
    half = dec.sort_order[: dec.segs_per_frame // 2]
    dec.lane_steps = dec.lane_steps.copy()
    dec.lane_steps[half] *= 4
    dec.sort_order = np.argsort(-dec.lane_steps, kind="stable")
    assert len(dec._phases_for(3, dec.max_steps)) > 1  # narrowing real
    second = np.asarray(dec.decode_batch(jpegs, chunk=3))  # phased
    np.testing.assert_array_equal(first, second)
    for i, jpg in enumerate(jpegs):
        golden = jpeg_tpu.decode_jpeg(jpg, exact=True).pixels()
        assert np.abs(second[i].astype(int) - golden.astype(int)).max() <= 1


def test_phased_misprediction_falls_back(monkeypatch):
    """Absurdly low learned bounds must starve, redo the chunk on the
    classic path, INFLATE the sticky budgets (round-3 policy: dropping
    them caused learn/retrace churn), and still decode correctly."""
    monkeypatch.setenv("JPEG_TPU_PREP", "rows")
    params = EncodeParams(h=2, v=2, quality=85, restart_interval=1,
                          optimize=False, exact=False)
    jpegs = [
        encode_jpeg(make_ppm(160, 120, seed=210 + i), params)
        for i in range(2)
    ]
    dec = DeviceDecoder.for_stream(jpegs[0])
    spf = dec.segs_per_frame
    dec.lane_steps = np.full(spf, 8, np.int64)  # nonsense: ~8 steps/lane
    dec.sort_order = np.arange(spf)
    batch = np.asarray(dec.decode_batch(jpegs))
    assert dec.lane_steps is not None and dec.lane_steps.min() > 8
    from jpeg_tpu.utils.metrics import default_metrics

    assert default_metrics.counters.get("device_decode.phase_inflate", 0) > 0
    for i, jpg in enumerate(jpegs):
        golden = jpeg_tpu.decode_jpeg(jpg, exact=True).pixels()
        assert np.abs(batch[i].astype(int) - golden.astype(int)).max() <= 1


def test_short_mcu_accounting_fires_without_checks(monkeypatch):
    """A truncated frame in a batch must trip the always-on decoded-MCU
    accounting (the reference prints expected-vs-processed
    unconditionally, common.c:174) -- no JPEG_TPU_CHECKS needed."""
    monkeypatch.delenv("JPEG_TPU_CHECKS", raising=False)
    params = EncodeParams(h=2, v=2, quality=75, restart_interval=2,
                          optimize=False, exact=False)
    good = encode_jpeg(make_ppm(64, 48, seed=7), params)
    # Empty the final restart segment: keep the last RSTn, drop the tail
    # ECS bytes, close with EOI -- 2 MCUs short of the geometry.
    last = max(good.rfind(bytes([0xFF, 0xD0 + k])) for k in range(8))
    assert last > 0
    bad = good[: last + 2] + b"\xff\xd9"
    dec = DeviceDecoder.for_stream(good)
    from jpeg_tpu.utils.metrics import default_metrics

    before = default_metrics.counters.get("device_decode.short_mcus", 0)
    with pytest.warns(RuntimeWarning, match="MCUs"):
        batch = np.asarray(dec.decode_batch([good, bad]))
    assert default_metrics.counters["device_decode.short_mcus"] == before + 1
    # The intact frame still decodes correctly.
    golden = jpeg_tpu.decode_jpeg(good, exact=True).pixels()
    assert np.abs(batch[0].astype(int) - golden.astype(int)).max() <= 1


def test_device_batch_ycck():
    """4-component YCCK/Adobe stream with restart markers through the
    batched device decoder (CMYK inversion runs on-device)."""
    from test_crafted_streams import _emit_header, _rand_planes, _tables
    from jpeg_tpu.constants import (
        STD_CHROMINANCE_QUANT, STD_LUMINANCE_QUANT, scale_qtable,
    )
    from jpeg_tpu.entropy.encode import pack_scan, symbolize_scan
    from jpeg_tpu.format import emit
    from jpeg_tpu.geometry import Component, FrameGeometry, ScanInfo, with_block_grid

    geom = with_block_grid(
        FrameGeometry(
            precision=8, height=24, width=32,
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
    planes = _rand_planes(geom, seed=52, dc_range=120, ac_range=12)
    info = ScanInfo(component_ids=(1, 2, 3, 4), td=(0, 1, 1, 0), ta=(0, 1, 1, 0))
    syms = symbolize_scan(planes, geom, info, restart_interval=3)
    segs = pack_scan(syms, _tables(), restart_interval=3)
    jpg = bytes(
        _emit_header(geom, qtables) + emit.emit_dri(3) + emit.emit_sos(info)
        + emit.emit_scan_body(segs) + emit.emit_eoi()
    )
    golden = jpeg_tpu.decode_jpeg(jpg, exact=True).pixels()
    assert ref_decode(jpg) == jpeg_tpu.decode_jpeg(jpg, exact=True).to_pnm()

    dec = DeviceDecoder.for_stream(jpg)
    batch = np.asarray(dec.decode_batch([jpg, jpg]))
    assert batch.shape == (2, 24, 32, 3)  # K folded into RGB on-device
    for i in range(2):
        assert np.abs(batch[i].astype(int) - golden.astype(int)).max() <= 1


def test_device_batch_rejects_mixed_geometry():
    """Frames of a different size must raise, not silently corrupt."""
    from jpeg_tpu.errors import UnsupportedError

    params = EncodeParams(h=2, v=2, quality=75, restart_interval=2,
                          optimize=False, exact=False)
    a = encode_jpeg(make_ppm(64, 48, seed=1), params)
    b = encode_jpeg(make_ppm(48, 32, seed=2), params)
    dec = DeviceDecoder.for_stream(a)
    dec.header = b""  # force the generic parser path (fast path already
    # rejects via header byte-identity)
    with pytest.raises(UnsupportedError):
        dec.decode_batch([a, b])


def test_device_batch_444():
    """4:4:4 color (h=v=1, three full-res components) batch decode."""
    params = EncodeParams(h=1, v=1, quality=85, restart_interval=3,
                          optimize=False, exact=False)
    jpegs = [encode_jpeg(make_ppm(40, 32, seed=160 + i), params) for i in range(2)]
    dec = DeviceDecoder.for_stream(jpegs[0])
    batch = np.asarray(dec.decode_batch(jpegs))
    assert batch.shape == (2, 32, 40, 3)
    for i, jpg in enumerate(jpegs):
        golden = jpeg_tpu.decode_jpeg(jpg, exact=True).pixels()
        assert np.abs(batch[i].astype(int) - golden.astype(int)).max() <= 1


def test_mixed_table_stream_falls_back_per_frame():
    """A frame with different (optimized) Huffman tables inside a batch
    degrades to the per-frame path instead of raising (round-1 weak #6);
    all frames come back pixel-correct."""
    import jpeg_tpu
    from jpeg_tpu.models.device_decode import DeviceDecoder

    params = EncodeParams(h=2, v=2, quality=75, optimize=False,
                          restart_interval=2, exact=True)
    frames = [encode_jpeg(make_ppm(64, 48, seed=s), params) for s in range(3)]
    odd = encode_jpeg(
        make_ppm(64, 48, seed=9),
        EncodeParams(h=2, v=2, quality=75, optimize=True,
                     restart_interval=2, exact=True),
    )
    stream = [frames[0], frames[1], odd, frames[2]]
    dec = DeviceDecoder.for_stream(stream[0])
    px = np.asarray(dec.decode_batch(stream, chunk=2))
    assert px.shape[0] == 4
    for i, f in enumerate(stream):
        want = jpeg_tpu.decode_jpeg(f, exact=False).pixels()
        got = px[i].astype(np.int32)
        assert np.abs(got - want).max() <= 1
