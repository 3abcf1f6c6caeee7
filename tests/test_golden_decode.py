"""Golden end-to-end decode tests: our decoder vs the reference binary.

The compiled reference `decoder` is the executable spec (SURVEY §4): for
every JPEG the reference encoder produces, our decode must emit the exact
same PNM bytes the reference decoder does.
"""

import pytest

import jpeg_tpu
from refbin import ensure_reference_binaries, make_pgm, make_ppm, ref_decode, ref_encode

pytestmark = pytest.mark.skipif(
    ensure_reference_binaries() is None, reason="reference toolchain unavailable"
)


def _roundtrip_golden(pnm: bytes, **enc):
    jpg = ref_encode(pnm, **enc)
    golden = ref_decode(jpg)
    img = jpeg_tpu.decode_jpeg(jpg, exact=True)
    ours = img.to_pnm()
    assert ours == golden, (
        f"decode mismatch: {len(ours)} vs {len(golden)} bytes, "
        f"first diff at {next((i for i, (a, b) in enumerate(zip(ours, golden)) if a != b), -1)}"
    )


def test_grayscale_q75_default_tables():
    _roundtrip_golden(make_pgm(64, 64, seed=0), h=1, v=1, q=75, optimize=0)


def test_grayscale_q75_optimized():
    _roundtrip_golden(make_pgm(64, 64, seed=1), h=1, v=1, q=75, optimize=1)


@pytest.mark.parametrize("h,v", [(1, 1), (2, 1), (1, 2), (2, 2)])
def test_color_subsampling(h, v):
    _roundtrip_golden(make_ppm(48, 32, seed=2), h=h, v=v, q=75, optimize=1)


@pytest.mark.parametrize("q", [1, 10, 50, 90, 100])
def test_quality_sweep(q):
    _roundtrip_golden(make_ppm(40, 24, seed=3), h=2, v=2, q=q, optimize=1)


def test_odd_dimensions():
    # Forces MCU padding on both axes.
    _roundtrip_golden(make_ppm(33, 17, seed=4), h=2, v=2, q=75, optimize=1)
    _roundtrip_golden(make_pgm(9, 25, seed=5), h=1, v=1, q=75, optimize=1)


def test_default_tables_color():
    _roundtrip_golden(make_ppm(32, 32, seed=6), h=2, v=1, q=75, optimize=0)


def test_larger_image():
    _roundtrip_golden(make_ppm(128, 96, seed=7), h=2, v=2, q=85, optimize=1)
