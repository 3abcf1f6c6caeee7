"""Motion-JPEG stream handling: splitting, implicit tables, fault isolation."""

import numpy as np
import pytest

import jpeg_tpu
from jpeg_tpu.encoder import EncodeParams, encode_jpeg
from jpeg_tpu.mjpeg import decode_stream, split_stream
from refbin import ensure_reference_binaries, make_ppm, ref_decode

pytestmark = pytest.mark.skipif(
    ensure_reference_binaries() is None, reason="reference toolchain unavailable"
)

PARAMS = EncodeParams(h=2, v=1, quality=75, optimize=False)


def _frames(n, w=48, h=32):
    return [encode_jpeg(make_ppm(w, h, seed=100 + i), PARAMS) for i in range(n)]


def test_split_stream_roundtrip():
    frames = _frames(4)
    stream = b"".join(frames)
    parts = split_stream(stream)
    assert parts == frames


def test_decode_stream_all_ok():
    frames = _frames(3)
    res = decode_stream(b"".join(frames), exact=True)
    assert res.ok_count == 3 and not res.errors
    for img, jpg in zip(res.frames, frames):
        assert img.to_pnm() == ref_decode(jpg)


def test_decode_stream_fault_isolation():
    frames = _frames(3)
    # Break frame 1's SOF so it fails hard (unsupported/parse error),
    # others must still decode.
    bad = bytearray(frames[1])
    i = bad.find(b"\xff\xc0")
    bad[i + 1] = 0xC2  # progressive -> UnsupportedError
    res = decode_stream(frames[0] + bytes(bad) + frames[2], exact=True)
    assert res.ok_count == 2
    assert len(res.errors) == 1 and res.errors[0][0] == 1
    assert "progressive" in res.errors[0][1]


def test_headerless_mjpeg_frame_decodes_with_implicit_tables():
    """Strip the DHT segments: the implicit Annex-K tables must kick in
    (the reference's whole MJPEG story, common.c:90-99)."""
    jpg = _frames(1)[0]
    out = bytearray()
    i = 0
    data = jpg
    # remove every DHT segment (FF C4 len payload)
    while i < len(data):
        if data[i] == 0xFF and i + 1 < len(data) and data[i + 1] == 0xC4:
            seg_len = (data[i + 2] << 8) | data[i + 3]
            i += 2 + seg_len
        else:
            out.append(data[i])
            i += 1
    headerless = bytes(out)
    assert b"\xff\xc4" not in headerless[:200]
    ours = jpeg_tpu.decode_jpeg(headerless, exact=True).to_pnm()
    assert ours == ref_decode(headerless) == ref_decode(jpg)


def test_decode_stream_device_matches_per_frame():
    import numpy as np

    from jpeg_tpu import mjpeg
    from jpeg_tpu.encoder import EncodeParams, encode_jpeg

    params = EncodeParams(h=2, v=2, quality=75, optimize=False,
                          restart_interval=2, exact=False)
    frames = [encode_jpeg(make_ppm(48, 32, seed=30 + i), params) for i in range(3)]
    px = np.asarray(mjpeg.decode_stream_device(b"".join(frames), chunk=2))
    assert px.shape == (3, 32, 48, 3)
    res = mjpeg.decode_stream(b"".join(frames), exact=True)
    for i, img in enumerate(res.frames):
        assert np.abs(px[i].astype(int) - img.pixels().astype(int)).max() <= 1


def test_mjpeg_cli_roundtrip(tmp_path):
    import subprocess
    import sys as _sys

    from jpeg_tpu.encoder import EncodeParams, encode_jpeg

    params = EncodeParams(h=1, v=1, quality=80, optimize=False,
                          restart_interval=2, exact=False)
    frames = [encode_jpeg(make_ppm(32, 24, seed=40 + i), params) for i in range(2)]
    src = tmp_path / "in.mjpg"
    src.write_bytes(b"".join(frames))
    out = tmp_path / "frames"
    r = subprocess.run(
        [_sys.executable, "-m", "jpeg_tpu.cli", "mjpeg", str(src), str(out)],
        capture_output=True, text=True, cwd="/root/repo",
        env=_cli_env(),
    )
    assert r.returncode == 0, r.stderr
    assert sorted(p.name for p in out.iterdir()) == [
        "frame_00000.ppm", "frame_00001.ppm"]


def _cli_env():
    import os

    env = dict(os.environ)
    # FORCE cpu: this box exports JAX_PLATFORMS=axon globally, so a
    # setdefault would leave the child pointed at the remote tunnel --
    # which can be down for hours and hangs PJRT init inside a native
    # call.  Tests must be deterministic and offline.
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_split_stream_skips_embedded_thumbnail():
    """An EXIF/APP1-embedded JPEG (own SOI/EOI inside the APPn payload)
    must not mis-split the parent frame (round-1 weak finding #4)."""
    from jpeg_tpu.encoder import EncodeParams, encode_jpeg
    from jpeg_tpu.mjpeg import split_stream
    from refbin import make_ppm

    params = EncodeParams(h=2, v=2, quality=75, restart_interval=2)
    thumb = encode_jpeg(make_ppm(16, 16, seed=1), params)
    frame = encode_jpeg(make_ppm(64, 48, seed=2), params)
    # wrap the thumbnail in an APP1 segment right after the parent's SOI
    app1 = b"\xff\xe1" + (2 + 6 + len(thumb)).to_bytes(2, "big") + b"Exif\x00\x00" + thumb
    with_thumb = frame[:2] + app1 + frame[2:]
    stream = with_thumb + frame + with_thumb
    parts = split_stream(stream)
    assert len(parts) == 3
    assert parts[0] == with_thumb
    assert parts[1] == frame
    assert parts[2] == with_thumb
    # and the embedded-thumbnail frame still decodes
    import jpeg_tpu

    img = jpeg_tpu.decode_jpeg(parts[0])
    assert img.width == 64 and img.height == 48


def test_decode_stream_device_rstless():
    """An MJPEG stream WITHOUT restart markers routes through the
    speculative per-frame device path (one lane per frame would be the
    degenerate alternative); pixels match the host fast path."""
    import jpeg_tpu
    from jpeg_tpu.encoder import EncodeParams, encode_jpeg
    from jpeg_tpu.mjpeg import decode_stream_device

    params = EncodeParams(h=2, v=2, quality=80, restart_interval=0)
    frames = [encode_jpeg(make_ppm(160, 120, seed=40 + i), params)
              for i in range(3)]
    assert all(f.find(b"\xff\xd0") < 0 for f in frames)  # truly RST-less
    px = np.asarray(decode_stream_device(b"".join(frames)))
    assert px.shape == (3, 120, 160, 3)
    for i, f in enumerate(frames):
        want = jpeg_tpu.decode_jpeg(f, exact=False).pixels()
        assert np.abs(px[i].astype(np.int32) - want).max() <= 1
