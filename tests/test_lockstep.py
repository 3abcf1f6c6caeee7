"""Lockstep (segment-parallel) entropy decoder vs the serial oracle and
the reference binary."""

import numpy as np
import pytest

import jpeg_tpu
from jpeg_tpu.encoder import EncodeParams, encode_jpeg
from refbin import ensure_reference_binaries, make_pgm, make_ppm, ref_decode, ref_encode

pytestmark = pytest.mark.skipif(
    ensure_reference_binaries() is None, reason="reference toolchain unavailable"
)


def _cross_validate(jpg: bytes):
    cs_a, planes_a = jpeg_tpu.decode_coefficients(jpg, entropy="serial")
    cs_b, planes_b = jpeg_tpu.decode_coefficients(jpg, entropy="lockstep")
    for cid in planes_a:
        np.testing.assert_array_equal(
            planes_a[cid], planes_b[cid], err_msg=f"component {cid}"
        )


@pytest.mark.parametrize("ri", [1, 2, 3, 7, 64])
def test_lockstep_restart_intervals_color(ri):
    pnm = make_ppm(48, 40, seed=30)
    jpg = encode_jpeg(pnm, EncodeParams(h=2, v=2, quality=75, restart_interval=ri))
    _cross_validate(jpg)
    # end-to-end vs reference decoder
    assert jpeg_tpu.decode_jpeg(jpg, entropy="lockstep").to_pnm() == ref_decode(jpg)


def test_lockstep_single_segment():
    """No RSTs: one lane, still must match."""
    pnm = make_pgm(32, 24, seed=31)
    jpg = ref_encode(pnm, h=1, v=1, q=75, optimize=1)
    _cross_validate(jpg)


@pytest.mark.parametrize("h,v", [(1, 1), (2, 1), (2, 2)])
def test_lockstep_subsampling(h, v):
    pnm = make_ppm(64, 48, seed=32)
    jpg = encode_jpeg(
        pnm, EncodeParams(h=h, v=v, quality=85, restart_interval=2)
    )
    _cross_validate(jpg)
    assert jpeg_tpu.decode_jpeg(jpg, entropy="lockstep").to_pnm() == ref_decode(jpg)


def test_lockstep_12bit():
    pnm = make_ppm(40, 32, seed=33, maxval=4095)
    jpg = encode_jpeg(pnm, EncodeParams(h=2, v=1, quality=75, restart_interval=3))
    _cross_validate(jpg)
    assert jpeg_tpu.decode_jpeg(jpg, entropy="lockstep").to_pnm() == ref_decode(jpg)


def test_lockstep_quality_extremes():
    pnm = make_ppm(32, 32, seed=34)
    for q in (1, 100):
        jpg = encode_jpeg(pnm, EncodeParams(h=2, v=2, quality=q, restart_interval=1))
        _cross_validate(jpg)


def test_lockstep_truncated_tail():
    """Cut the last segment short: both backends degrade identically."""
    pnm = make_ppm(48, 48, seed=35)
    jpg = encode_jpeg(pnm, EncodeParams(h=1, v=1, quality=75, restart_interval=4))
    # Chop some bytes before the EOI (truncating the final ECS), keep EOI.
    cut = jpg[:-12] + jpg[-2:]
    _cross_validate(cut)
