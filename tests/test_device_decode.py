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
