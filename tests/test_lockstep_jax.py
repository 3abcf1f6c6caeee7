"""JAX lockstep decoder vs the NumPy engine and serial oracle (on CPU)."""

import numpy as np
import pytest

import jpeg_tpu
from jpeg_tpu.encoder import EncodeParams, encode_jpeg
from refbin import ensure_reference_binaries, make_pgm, make_ppm, ref_decode

pytestmark = pytest.mark.skipif(
    ensure_reference_binaries() is None, reason="reference toolchain unavailable"
)


def _cross(jpg: bytes):
    _, a = jpeg_tpu.decode_coefficients(jpg, entropy="serial")
    _, b = jpeg_tpu.decode_coefficients(jpg, entropy="lockstep-jax")
    for cid in a:
        np.testing.assert_array_equal(a[cid], b[cid], err_msg=f"component {cid}")


@pytest.mark.parametrize("ri", [1, 3, 16])
def test_jax_lockstep_color(ri):
    jpg = encode_jpeg(
        make_ppm(48, 40, seed=40), EncodeParams(h=2, v=2, quality=75, restart_interval=ri)
    )
    _cross(jpg)
    assert jpeg_tpu.decode_jpeg(jpg, entropy="lockstep-jax").to_pnm() == ref_decode(jpg)


def test_jax_lockstep_gray_single_segment():
    jpg = encode_jpeg(make_pgm(32, 24, seed=41), EncodeParams(h=1, v=1, quality=75))
    _cross(jpg)


def test_jax_lockstep_12bit():
    jpg = encode_jpeg(
        make_ppm(40, 32, seed=42, maxval=4095),
        EncodeParams(h=2, v=1, quality=75, restart_interval=2),
    )
    _cross(jpg)


def test_jax_lockstep_truncated():
    jpg = encode_jpeg(
        make_ppm(48, 48, seed=43), EncodeParams(h=1, v=1, quality=75, restart_interval=4)
    )
    cut = jpg[:-12] + jpg[-2:]
    _cross(cut)


def test_checkify_tier_flags_corrupt_stream(monkeypatch):
    """JPEG_TPU_CHECKS=2: the checkified scan raises on an invalid
    in-kernel symbol instead of silently killing the lane (SURVEY §5
    sanitizer row); without checks the same stream degrades gracefully."""
    from jpeg_tpu.errors import CorruptStream
    from jpeg_tpu.format.parse import parse_codestream

    jpg = encode_jpeg(
        make_ppm(48, 40, seed=44),
        EncodeParams(h=2, v=2, quality=75, restart_interval=2),
    )
    cs = parse_codestream(jpg)
    s, e = cs.scans[0].ecs_ranges[0]
    mid = (s + e) // 2
    bad = bytearray(jpg)
    # 0xFF00 = a stuffed literal 0xFF byte: 16 one-bits mid-segment is an
    # invalid prefix (or an absurd DC category) for the K.3 tables.
    bad[mid : mid + 4] = b"\xff\x00\xff\x00"
    bad = bytes(bad)

    monkeypatch.delenv("JPEG_TPU_CHECKS", raising=False)
    jpeg_tpu.decode_coefficients(bad, entropy="lockstep-jax")  # graceful

    monkeypatch.setenv("JPEG_TPU_CHECKS", "2")
    with pytest.raises(CorruptStream, match="sanitizer"):
        jpeg_tpu.decode_coefficients(bad, entropy="lockstep-jax")
    # A valid stream passes the checkified path bit-exactly.
    _, a = jpeg_tpu.decode_coefficients(jpg, entropy="lockstep-jax")
    monkeypatch.delenv("JPEG_TPU_CHECKS", raising=False)
    _, b = jpeg_tpu.decode_coefficients(jpg, entropy="serial")
    for cid in a:
        np.testing.assert_array_equal(a[cid], b[cid])
