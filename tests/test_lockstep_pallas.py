"""Pallas lockstep engine vs the scan engine (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

import jpeg_tpu
from jpeg_tpu.encoder import EncodeParams, encode_jpeg
from jpeg_tpu.entropy.lockstep_jax import (
    _cached_plan,
    _max_steps_for,
    _segments_to_words,
    decode_scan_device,
)
from jpeg_tpu.entropy.lockstep_pallas import (
    decode_scan_device_pallas,
    default_interpret,
)
from jpeg_tpu.format.parse import parse_codestream, unstuff
from refbin import ensure_reference_binaries, make_ppm

pytestmark = pytest.mark.skipif(
    ensure_reference_binaries() is None, reason="reference toolchain unavailable"
)


def _engines_agree(jpg: bytes):
    cs = parse_codestream(jpg)
    scan = cs.scans[0]
    plan = _cached_plan(
        cs.geometry, scan.info, tuple(sorted(scan.htables.items()))
    )
    segs = [unstuff(jpg[s:e]) for s, e in scan.ecs_ranges]
    words, nbits = _segments_to_words(segs)
    total = sum(c.n_blocks for c in cs.geometry.components)
    steps = _max_steps_for(nbits, plan, scan.ri, optimistic=False)
    a = decode_scan_device(
        plan, jnp.asarray(words), jnp.asarray(nbits, jnp.int32), steps, total
    )
    b = decode_scan_device_pallas(
        plan,
        jnp.asarray(words),
        jnp.asarray(nbits, jnp.int32),
        steps,
        total,
        interpret=default_interpret(),
    )
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_pallas_engine_color_rst():
    _engines_agree(
        encode_jpeg(
            make_ppm(96, 64, seed=300),
            EncodeParams(h=2, v=2, quality=80, optimize=False, restart_interval=2),
        )
    )


def test_pallas_engine_gray():
    from refbin import make_pgm

    _engines_agree(
        encode_jpeg(
            make_pgm(64, 64, seed=301),
            EncodeParams(h=1, v=1, quality=75, optimize=False, restart_interval=4),
        )
    )
