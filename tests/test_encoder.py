"""Encoder tests: byte-identical output vs the reference encoder, plus
round-trips and the restart-interval extension."""

import numpy as np
import pytest

import jpeg_tpu
from jpeg_tpu.encoder import EncodeParams, encode_jpeg
from refbin import ensure_reference_binaries, make_pgm, make_ppm, ref_decode, ref_encode

pytestmark = pytest.mark.skipif(
    ensure_reference_binaries() is None, reason="reference toolchain unavailable"
)


def _first_diff(a: bytes, b: bytes) -> int:
    return next((i for i, (x, y) in enumerate(zip(a, b)) if x != y), min(len(a), len(b)))


def _byte_identical(pnm: bytes, h, v, q, optimize):
    theirs = ref_encode(pnm, h=h, v=v, q=q, optimize=optimize)
    ours = encode_jpeg(
        pnm, EncodeParams(h=h, v=v, quality=q, optimize=bool(optimize))
    )
    assert ours == theirs, (
        f"encoder mismatch: {len(ours)} vs {len(theirs)} bytes, "
        f"first diff at {_first_diff(ours, theirs)}"
    )


def test_gray_default_tables():
    _byte_identical(make_pgm(64, 48, seed=10), 1, 1, 75, 0)


def test_gray_optimized():
    _byte_identical(make_pgm(64, 48, seed=11), 1, 1, 75, 1)


@pytest.mark.parametrize("h,v", [(1, 1), (2, 1), (1, 2), (2, 2)])
def test_color_subsampling(h, v):
    _byte_identical(make_ppm(48, 40, seed=12), h, v, 75, 1)


@pytest.mark.parametrize("q", [1, 25, 50, 75, 95, 100])
def test_quality_sweep(q):
    _byte_identical(make_ppm(32, 24, seed=13), 2, 1, q, 1)


def test_odd_dims_default_tables():
    _byte_identical(make_ppm(33, 17, seed=14), 2, 2, 75, 0)


def test_odd_dims_optimized():
    _byte_identical(make_ppm(31, 19, seed=15), 2, 2, 80, 1)


def test_restart_interval_decodes_bit_exact():
    """Our DRI/RST extension must decode identically via the reference."""
    pnm = make_ppm(64, 48, seed=16)
    plain = encode_jpeg(pnm, EncodeParams(h=2, v=2, quality=75))
    rst = encode_jpeg(
        pnm, EncodeParams(h=2, v=2, quality=75, restart_interval=3)
    )
    assert rst != plain
    assert ref_decode(rst) == ref_decode(plain)
    # and our own decoder agrees
    assert jpeg_tpu.decode_jpeg(rst).to_pnm() == ref_decode(plain)


def test_roundtrip_psnr():
    pnm = make_ppm(64, 64, seed=17)
    jpg = encode_jpeg(pnm, EncodeParams(h=2, v=1, quality=90))
    img = jpeg_tpu.decode_jpeg(jpg)
    import io

    from jpeg_tpu.utils.pnm import read_pnm

    src = read_pnm(pnm).data
    dec = img.pixels().astype(np.float64)
    mse = ((src[: img.height, : img.width] - dec) ** 2).mean()
    psnr = 10 * np.log10(255.0**2 / mse)
    # The absolute value depends on the noisy synthetic content; the real
    # PSNR-vs-reference gate is implied by byte-identical encoder output.
    assert psnr > 30.0, psnr
