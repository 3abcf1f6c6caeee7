"""Native (C++) entropy backend vs serial oracle + reference binary."""

import numpy as np
import pytest

import jpeg_tpu
from jpeg_tpu import native
from jpeg_tpu.encoder import EncodeParams, encode_jpeg
from refbin import ensure_reference_binaries, make_pgm, make_ppm, ref_decode, ref_encode

pytestmark = pytest.mark.skipif(
    ensure_reference_binaries() is None or not native.available(),
    reason="toolchain unavailable",
)


def _cross(jpg: bytes):
    _, a = jpeg_tpu.decode_coefficients(jpg, entropy="serial")
    _, b = jpeg_tpu.decode_coefficients(jpg, entropy="native")
    for cid in a:
        np.testing.assert_array_equal(a[cid], b[cid], err_msg=f"component {cid}")


@pytest.mark.parametrize("ri", [0, 1, 3, 16])
def test_native_color(ri):
    jpg = encode_jpeg(
        make_ppm(48, 40, seed=60),
        EncodeParams(h=2, v=2, quality=75, restart_interval=ri),
    )
    _cross(jpg)
    assert jpeg_tpu.decode_jpeg(jpg, entropy="native").to_pnm() == ref_decode(jpg)


def test_native_gray_and_12bit():
    _cross(ref_encode(make_pgm(32, 24, seed=61), h=1, v=1, q=75, optimize=1))
    _cross(
        encode_jpeg(
            make_ppm(40, 32, seed=62, maxval=4095),
            EncodeParams(h=2, v=1, quality=75, restart_interval=2),
        )
    )


def test_native_truncated():
    jpg = encode_jpeg(
        make_ppm(48, 48, seed=63),
        EncodeParams(h=1, v=1, quality=75, restart_interval=4),
    )
    cut = jpg[:-12] + jpg[-2:]
    _cross(cut)


def test_native_larger():
    jpg = encode_jpeg(
        make_ppm(320, 240, seed=64),
        EncodeParams(h=2, v=2, quality=85, restart_interval=8),
    )
    _cross(jpg)
    assert jpeg_tpu.decode_jpeg(jpg, entropy="native").to_pnm() == ref_decode(jpg)


def test_native_encode_backend_byte_identical():
    """The threaded C++ entropy encoder (entropy_backend='native') must
    be byte-identical to the numpy packer across modes."""
    from jpeg_tpu import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    from jpeg_tpu.encoder import EncodeParams, encode_jpeg

    cases = [
        (dict(h=2, v=2, quality=80, restart_interval=3, optimize=False),
         make_ppm(96, 72, seed=5)),
        (dict(h=2, v=1, quality=75, restart_interval=0, optimize=True),
         make_ppm(64, 48, seed=6)),
        (dict(h=1, v=1, quality=90, restart_interval=2, optimize=False),
         make_pgm(40, 40, seed=7)),
        (dict(h=2, v=2, quality=85, restart_interval=2, optimize=True),
         make_ppm(80, 56, seed=8, maxval=4095)),  # 12-bit
    ]
    for kw, pnm in cases:
        a = encode_jpeg(pnm, EncodeParams(**kw, entropy_backend="numpy"))
        b = encode_jpeg(pnm, EncodeParams(**kw, entropy_backend="native"))
        assert a == b, kw
