"""Pallas lane-region placement vs the scatter path (interpret mode).

The kernel (entropy/place_pallas) replaces the placement scatter on
eligible streams; its contract is exact agreement with
``_place_emissions`` on the same emission stream (write-once slots,
identical key decode: coeffs.c:247 zig-zag placement semantics).
"""

import numpy as np
import pytest

import jax.numpy as jnp

import jpeg_tpu
from jpeg_tpu.encoder import EncodeParams, encode_jpeg
from jpeg_tpu.entropy.lockstep_jax import (
    _cached_plan,
    _max_steps_for,
    _place_emissions,
    _scan_lanes,
    _segments_to_words,
)
from jpeg_tpu.entropy.place_pallas import (
    place_emissions_region,
    placement_eligible,
)
from jpeg_tpu.format.parse import parse_codestream, unstuff
from jpeg_tpu.models.device_decode import DeviceDecoder
from refbin import ensure_reference_binaries, make_ppm

pytestmark = pytest.mark.skipif(
    ensure_reference_binaries() is None, reason="reference toolchain unavailable"
)


def _scan_setup(jpeg: bytes):
    cs = parse_codestream(jpeg)
    scan = cs.scans[0]
    plan = _cached_plan(
        cs.geometry, scan.info, tuple(sorted(scan.htables.items()))
    )
    segments = [unstuff(jpeg[s:e]) for s, e in scan.ecs_ranges]
    words, nbits = _segments_to_words(segments)
    total_blocks = sum(c.n_blocks for c in cs.geometry.components)
    return cs, scan, plan, words, nbits, total_blocks


@pytest.mark.parametrize(
    "h,v,ri,size,gray",
    [
        (2, 2, 2, (64, 32), False),  # 4:2:0, bpm=6
        (1, 1, 3, (48, 48), False),  # 4:4:4, bpm=3 (odd region pad)
        (1, 1, 4, (48, 48), True),   # grayscale: Ns=1 non-interleaved
    ],
)
def test_region_placement_matches_scatter(h, v, ri, size, gray):
    from refbin import make_pgm

    params = EncodeParams(h=h, v=v, quality=80, restart_interval=ri,
                          optimize=False, exact=False)
    src = make_pgm(*size, seed=7 * h + ri) if gray else make_ppm(
        *size, seed=7 * h + ri)
    jpeg = encode_jpeg(src, params)
    cs, scan, plan, words, nbits, total_blocks = _scan_setup(jpeg)
    spf = len(scan.ecs_ranges)
    assert placement_eligible(plan, scan.ri, spf)

    max_steps = _max_steps_for(nbits, plan, scan.ri, optimistic=False)
    counts, (em_key, em_val), starved, nsteps = _scan_lanes(
        plan, jnp.asarray(words), jnp.asarray(nbits, jnp.int32), max_steps
    )
    assert not bool(starved)
    ref = np.asarray(_place_emissions(
        plan, counts, [(em_key, em_val)], 1, spf, total_blocks
    ))
    got = np.asarray(place_emissions_region(
        plan, em_key, em_val, nsteps, 1, spf, scan.ri, interpret=True
    ))
    np.testing.assert_array_equal(got, ref)


def test_eligibility_gates():
    # ri=3 does not divide m_x=4 -> reorder impossible, scatter path.
    params = EncodeParams(h=2, v=2, quality=75, restart_interval=3,
                          optimize=False, exact=False)
    jpeg = encode_jpeg(make_ppm(64, 32, seed=3), params)
    _, scan, plan, *_ = _scan_setup(jpeg)
    assert not placement_eligible(plan, scan.ri, len(scan.ecs_ranges))
    # no restart markers -> speculative territory, not this kernel
    params0 = EncodeParams(h=2, v=2, quality=75, restart_interval=0,
                           optimize=False, exact=False)
    jpeg0 = encode_jpeg(make_ppm(64, 32, seed=3), params0)
    _, scan0, plan0, *_ = _scan_setup(jpeg0)
    assert not placement_eligible(plan0, scan0.ri, len(scan0.ecs_ranges))


def test_device_batch_pallas_place(monkeypatch):
    """End-to-end decode_batch with the region kernel forced on (CPU
    interpret mode): pixels must match the exact host decode within the
    fast path's 1-count contract."""
    monkeypatch.setenv("JPEG_TPU_PLACE", "pallas")
    params = EncodeParams(h=2, v=2, quality=80, restart_interval=2,
                          optimize=False, exact=False)
    jpegs = [encode_jpeg(make_ppm(64, 48, seed=40 + i), params)
             for i in range(2)]
    dec = DeviceDecoder.for_stream(jpegs[0])
    assert dec.place_ri == 2
    batch = np.asarray(dec.decode_batch(jpegs))
    assert batch.shape == (2, 48, 64, 3)
    for i, jpg in enumerate(jpegs):
        golden = jpeg_tpu.decode_jpeg(jpg, exact=True).pixels()
        assert np.abs(batch[i].astype(int) - golden.astype(int)).max() <= 1
