"""Speculative RST-less parallel decode vs the serial oracle.

The reference decodes any baseline stream serially (read_ecs,
decoder.c:364-388); these tests pin that the chunked self-synchronizing
engine (entropy/speculative.py, SURVEY §2.2 row 4) reproduces the
oracle bit-exactly across the format matrix, degrades gracefully on
truncation, and reaches the API/CLI surface.
"""

from __future__ import annotations

import numpy as np
import pytest

from jpeg_tpu.encoder import EncodeParams, encode_jpeg
from jpeg_tpu.entropy import speculative as spec
from jpeg_tpu.entropy.serial import decode_scan_serial
from jpeg_tpu.format.parse import parse_codestream, unstuff
from jpeg_tpu.tables import derive_table

from refbin import ensure_reference_binaries, make_pgm, make_ppm, ref_decode

pytestmark = pytest.mark.skipif(
    ensure_reference_binaries() is None, reason="reference toolchain unavailable"
)


def _planes(geom):
    return {
        c.cid: np.zeros((c.n_blocks, 64), np.int32) for c in geom.components
    }


def _scan_parts(data):
    cs = parse_codestream(data)
    scan = cs.scans[0]
    assert len(scan.ecs_ranges) == 1  # RST-less: one ECS
    seg = unstuff(data[scan.ecs_ranges[0][0] : scan.ecs_ranges[0][1]])
    tables = {k: derive_table(s) for k, s in scan.htables.items()}
    return cs.geometry, scan, seg, tables


def _check(data, lanes):
    geom, scan, seg, tables = _scan_parts(data)
    p_ser, p_spec = _planes(geom), _planes(geom)
    decode_scan_serial(geom, scan.info, tables, [seg], p_ser)
    n = spec.decode_scan_speculative_jax(
        geom, scan.info, tables, seg, p_spec, lanes=lanes
    )
    for cid in p_ser:
        np.testing.assert_array_equal(p_ser[cid], p_spec[cid])
    return n


@pytest.mark.parametrize(
    "name,params,size",
    [
        ("420", EncodeParams(h=2, v=2, quality=85, optimize=True), (320, 240)),
        ("422", EncodeParams(h=2, v=1, quality=60, optimize=True), (256, 200)),
        ("444", EncodeParams(h=1, v=1, quality=90, optimize=False), (200, 160)),
    ],
)
def test_speculative_matches_serial_color(name, params, size):
    data = encode_jpeg(make_ppm(*size, seed=11), params)
    _check(data, lanes=12)


def test_speculative_matches_serial_gray():
    data = encode_jpeg(make_pgm(300, 200, seed=5), EncodeParams(quality=75))
    _check(data, lanes=12)


def test_speculative_many_lanes():
    """>=64 chunks on one RST-less frame (the VERDICT r1 criterion)."""
    data = encode_jpeg(
        make_pgm(1024, 768, seed=4), EncodeParams(quality=75, optimize=True)
    )
    geom, scan, seg, tables = _scan_parts(data)
    assert seg.size >= 64 * 1024  # enough bytes for >=64 chunks
    n = _check(data, lanes=128)
    assert n == geom.n_mcus


def test_speculative_truncated_stream_degrades():
    """Half a stream decodes partially, no crash (decoder.c:339-347)."""
    data = encode_jpeg(make_pgm(300, 200, seed=5), EncodeParams(quality=75))
    geom, scan, seg, tables = _scan_parts(data)
    p = _planes(geom)
    n = spec.decode_scan_speculative_jax(
        geom, scan.info, tables, seg[: seg.size // 2], p, lanes=12
    )
    assert 0 < n < geom.n_mcus


def test_speculative_api_and_cli_path():
    data = encode_jpeg(
        make_ppm(160, 120, seed=2), EncodeParams(h=2, v=2, quality=80)
    )
    import jpeg_tpu

    img = jpeg_tpu.decode_jpeg(data, entropy="speculative")
    assert img.to_pnm() == ref_decode(data)


def test_speculative_with_restart_markers_routes_to_restart_engine():
    """A scan WITH restart markers must decode exactly via the public
    speculative entry (round-2 advisor finding: per-segment speculation
    placed every segment at block 0 and clobbered its predecessors)."""
    data = encode_jpeg(
        make_ppm(160, 120, seed=31),
        EncodeParams(h=2, v=2, quality=80, restart_interval=2),
    )
    import jpeg_tpu

    img = jpeg_tpu.decode_jpeg(data, entropy="speculative")
    assert img.to_pnm() == ref_decode(data)

    # And directly through the scan wrapper vs the serial oracle.
    cs = parse_codestream(data)
    scan = cs.scans[0]
    assert len(scan.ecs_ranges) > 1  # restart markers present
    segs = [unstuff(data[s:e]) for (s, e) in scan.ecs_ranges]
    tables = {k: derive_table(s) for k, s in scan.htables.items()}
    p_ser, p_spec = _planes(cs.geometry), _planes(cs.geometry)
    decode_scan_serial(cs.geometry, scan.info, tables, segs, p_ser)
    n = spec.decode_scan_speculative(
        cs.geometry, scan.info, tables, segs, p_spec, ri=scan.ri
    )
    assert n == cs.geometry.n_mcus
    for cid in p_ser:
        np.testing.assert_array_equal(p_ser[cid], p_spec[cid])


def test_speculative_tiny_stream_falls_back():
    """Streams too small to chunk route to the serial oracle, and the
    silent de-parallelization shows up in the metrics counter."""
    from jpeg_tpu.utils.metrics import default_metrics

    before = default_metrics.counters.get("speculative.fallbacks", 0)
    data = encode_jpeg(make_ppm(24, 16, seed=9), EncodeParams(quality=75))
    _check(data, lanes=64)
    assert default_metrics.counters["speculative.fallbacks"] > before


def test_speculative_valid_stream_never_falls_back():
    """A healthy photographic stream must resolve speculatively -- the
    fallback counter stays put (fuzz-suite analog of the crash-freedom
    guarantee, VERDICT r2 weak #3)."""
    from jpeg_tpu.utils.metrics import default_metrics

    data = encode_jpeg(
        make_ppm(320, 240, seed=17), EncodeParams(h=2, v=2, quality=80)
    )
    before = default_metrics.counters.get("speculative.fallbacks", 0)
    _check(data, lanes=16)
    assert default_metrics.counters.get("speculative.fallbacks", 0) == before


def test_speculative_12bit_gray():
    """12-bit samples: DC categories up to 16, 16-bit extras."""
    from refbin import make_pgm

    data = encode_jpeg(
        make_pgm(200, 160, seed=21, maxval=4095),
        EncodeParams(quality=80, optimize=True),
    )
    _check(data, lanes=8)


def test_decode_frame_rstless_device():
    """Device-resident RST-less decode: stream in, HBM pixels out,
    within +-1 of the host fast path."""
    import jpeg_tpu
    from jpeg_tpu.models.device_decode import decode_frame_rstless

    data = encode_jpeg(
        make_ppm(320, 240, seed=13), EncodeParams(h=2, v=2, quality=80)
    )
    px = np.asarray(decode_frame_rstless(data, lanes=16))
    want = jpeg_tpu.decode_jpeg(data, exact=False).pixels()
    assert px.shape == want.shape
    assert np.abs(px.astype(np.int32) - want).max() <= 1


def test_decode_stream_rstless_batched():
    """ALL frames of an RST-less stream decode in ONE probe/resolve/final
    round (the round-3 batched core); per-frame pixels match the host
    fast path within +-1."""
    import jpeg_tpu
    from jpeg_tpu.models.device_decode import decode_stream_rstless

    # shared (MJPEG-style) tables: the batched core compiles one table
    # set in; per-frame optimized tables route through per-frame decode
    params = EncodeParams(h=2, v=2, quality=80, optimize=False)
    parts = [
        encode_jpeg(make_ppm(320, 240, seed=60 + i), params) for i in range(3)
    ]
    px = np.asarray(decode_stream_rstless(parts))
    assert px.shape[0] == 3
    for i, p in enumerate(parts):
        want = jpeg_tpu.decode_jpeg(p, exact=False).pixels()
        assert np.abs(px[i].astype(np.int32) - want).max() <= 1, i


def test_mjpeg_device_stream_rstless_routes_batched():
    """mjpeg.decode_stream_device on an RST-less stream goes through the
    batched speculative path and matches per-frame host decodes."""
    import jpeg_tpu
    from jpeg_tpu import mjpeg

    params = EncodeParams(h=2, v=2, quality=75, optimize=False)
    parts = [
        encode_jpeg(make_ppm(256, 192, seed=70 + i), params) for i in range(2)
    ]
    px = np.asarray(mjpeg.decode_stream_device(b"".join(parts)))
    for i, p in enumerate(parts):
        want = jpeg_tpu.decode_jpeg(p, exact=False).pixels()
        assert np.abs(px[i].astype(np.int32) - want).max() <= 1, i


def test_decode_frame_rstless_device_gray():
    import jpeg_tpu
    from jpeg_tpu.models.device_decode import decode_frame_rstless

    data = encode_jpeg(make_pgm(300, 200, seed=6), EncodeParams(quality=70))
    px = np.asarray(decode_frame_rstless(data, lanes=12))
    want = jpeg_tpu.decode_jpeg(data, exact=False).pixels()
    assert px.shape == want.shape
    assert np.abs(px.astype(np.int32) - want).max() <= 1


def test_fast_resolve_matches_host_walk(monkeypatch):
    """The device fast-path resolve (associative-scan authority chain +
    override rounds) must produce the SAME coefficients as the host walk
    on the same stream, including when link misses force a recovery
    round."""
    import jpeg_tpu
    from jpeg_tpu.models.device_decode import decode_stream_rstless
    from jpeg_tpu.utils.metrics import default_metrics

    params = EncodeParams(h=2, v=2, quality=75, optimize=False)
    parts = [
        encode_jpeg(make_ppm(400, 300, seed=80 + i), params) for i in range(2)
    ]
    before = default_metrics.counters.get("speculative.fast_misses", 0)
    fast = np.asarray(decode_stream_rstless(parts))
    assert default_metrics.counters.get(
        "speculative.fast_misses", 0
    ) == before, "fast path fell back to the host walk"
    monkeypatch.setenv("JPEG_TPU_SPEC_HOST", "1")
    host = np.asarray(decode_stream_rstless(parts))
    assert (fast == host).all()
    for i, p in enumerate(parts):
        want = jpeg_tpu.decode_jpeg(p, exact=False).pixels()
        assert np.abs(fast[i].astype(np.int32) - want).max() <= 1, i
