"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from jpeg_tpu.models.batch import BatchConfig, decode_batch_ycc
from jpeg_tpu.parallel.sharding import (
    make_mesh,
    make_sharded_decoder,
    make_sharded_roundtrip,
    replicate,
    shard_batch,
)


def _inputs(cfg, b, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.integers(-64, 64, size=(b, cfg.n_luma_blocks, 64)).astype(np.int32)
    cb = rng.integers(-32, 32, size=(b, cfg.n_chroma_blocks, 64)).astype(np.int32)
    cr = rng.integers(-32, 32, size=(b, cfg.n_chroma_blocks, 64)).astype(np.int32)
    qt_l = np.full(64, 8, dtype=np.int32)
    qt_c = np.full(64, 16, dtype=np.int32)
    return y, cb, cr, qt_l, qt_c


def test_mesh_shape():
    mesh = make_mesh(8)
    assert mesh.shape == {"frame": 4, "tile": 2}
    assert len(jax.devices()) >= 8


def test_sharded_decode_matches_single_device():
    cfg = BatchConfig(height=64, width=64, h=2, v=2)
    y, cb, cr, qt_l, qt_c = _inputs(cfg, b=8)
    ref = np.asarray(decode_batch_ycc(cfg, y, cb, cr, qt_l, qt_c))

    mesh = make_mesh(8)
    with mesh:
        ys, cbs, crs = shard_batch(mesh, y, cb, cr)
        ql, qc = replicate(mesh, qt_l, qt_c)
        out = make_sharded_decoder(cfg, mesh)(ys, cbs, crs, ql, qc)
    # Sharded vs unsharded compilations fuse differently: tiny f32 drift.
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3)


def test_sharded_roundtrip_runs_and_reduces():
    cfg = BatchConfig(height=64, width=64, h=2, v=2)
    b = 8
    y, cb, cr, qt_l, qt_c = _inputs(cfg, b=b, seed=1)
    mesh = make_mesh(8)
    with mesh:
        ys, cbs, crs = shard_batch(mesh, y, cb, cr)
        ql, qc = replicate(mesh, qt_l, qt_c)
        y2, cb2, cr2, hist = make_sharded_roundtrip(cfg, mesh)(ys, cbs, crs, ql, qc)
        jax.block_until_ready((y2, cb2, cr2, hist))
    assert y2.shape == y.shape
    assert int(np.asarray(hist).sum()) == b * cfg.n_luma_blocks


def test_graft_entry_contract():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2, 48, 64, 3)  # flagship: full entropy+dense decode
    import numpy as np

    assert np.asarray(out).dtype == np.uint8
    ge.dryrun_multichip(8)


def test_sharded_full_stream_decode_matches_single_device():
    """Entropy + dense decode sharded over 'frame' == unsharded output."""
    import jpeg_tpu
    from jpeg_tpu.encoder import EncodeParams, encode_jpeg
    from jpeg_tpu.models.device_decode import DeviceDecoder, _decode_impl
    from jpeg_tpu.parallel.sharding import make_mesh, make_sharded_stream_decoder
    from refbin import make_ppm

    params = EncodeParams(h=2, v=2, quality=75, optimize=False,
                          restart_interval=2, exact=False)
    jpegs = [encode_jpeg(make_ppm(48, 32, seed=60 + i), params) for i in range(4)]
    dec = DeviceDecoder.for_stream(jpegs[0])
    prepared = dec.prepare(jpegs)
    if prepared[0] == "flat":
        import jax.numpy as jnp
        buf, starts, nbits, qts = prepared[1:]
        idx = starts[:, None] + np.arange(dec.wn, dtype=np.int32)[None, :]
        words = np.asarray(buf)[np.minimum(idx, buf.shape[0] - 1)]
    else:
        words, _, nbits, qts = prepared[1:]
    from jpeg_tpu.entropy.lockstep_jax import _max_steps_for
    steps = _max_steps_for(nbits.astype(np.int64), dec.plan, dec.ri,
                           optimistic=False)

    mesh = make_mesh(8)  # ('frame', 'tile') = (4, 2)
    decode = make_sharded_stream_decoder(
        dec.plan, dec.geom, mesh, 4, dec.segs_per_frame, steps
    )
    px, starved = decode(words, nbits, qts)
    assert not np.asarray(starved).any()
    ref, _, _ = _decode_impl(dec.plan, dec.geom, jnp_arr(words),
                             jnp_arr(nbits), jnp_arr(qts), steps, 4,
                             dec.segs_per_frame)
    np.testing.assert_array_equal(np.asarray(px), np.asarray(ref))
    for i, jpg in enumerate(jpegs):
        golden = jpeg_tpu.decode_jpeg(jpg, exact=True).pixels()
        assert np.abs(np.asarray(px)[i].astype(int) - golden.astype(int)).max() <= 1


def jnp_arr(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


def test_sharded_full_stream_encode_matches_single_device():
    """Dense + entropy encode sharded over 'frame' == unsharded output,
    and the optimize dry pass reduces with a psum across shards."""
    import jpeg_tpu
    from jpeg_tpu.encoder import EncodeParams
    from jpeg_tpu.models.device_encode import DeviceEncoder
    from jpeg_tpu.parallel.sharding import make_mesh, make_sharded_stream_encoder
    from jpeg_tpu.utils.pnm import read_pnm
    from refbin import make_ppm

    params = EncodeParams(h=2, v=2, quality=75, optimize=False,
                          restart_interval=2, exact=False)
    ppms = [make_ppm(48, 32, seed=180 + s) for s in range(4)]
    pix = np.stack([read_pnm(p).data for p in ppms]).astype(np.uint8)
    enc = DeviceEncoder.for_config(32, 48, 3, params)
    expected = enc.encode_batch(pix)

    mesh = make_mesh(8)  # ('frame', 'tile') = (4, 2)
    encode = make_sharded_stream_encoder(enc, mesh, 4, with_hist=True)
    ec, es = jnp_arr(enc.ehufco), jnp_arr(enc.ehufsi)
    words, seg_bits, overflow, missing, hist = encode(jnp_arr(pix), ec, es)
    assert not np.asarray(overflow).any() and not np.asarray(missing).any()
    seg_bits = np.asarray(seg_bits)
    w_used = max(1, int((seg_bits.max() + 31) // 32))
    outs = enc._finalize(np.asarray(words[:, :w_used]), seg_bits, 4, b"")
    assert [bytes(o) for o in outs] == [bytes(o) for o in expected]
    # the psum'd histogram equals the single-device dry pass
    h1 = np.asarray(enc._run(pix, 4, enc.ehufco, enc.ehufsi, True)[4])
    np.testing.assert_array_equal(np.asarray(hist), h1)


def test_single_frame_segments_across_chips():
    """True context parallelism: ONE frame's restart segments shard over
    all 8 virtual devices; output equals the single-device decode
    bit-exactly (SURVEY §2.2 row 6; decoder.c:371-373 per-segment DC)."""
    from jax.sharding import Mesh
    from jpeg_tpu.api import decode_coefficients
    from jpeg_tpu.encoder import EncodeParams, encode_jpeg
    from jpeg_tpu.parallel.sharding import decode_frame_sharded
    from refbin import make_ppm

    data = encode_jpeg(
        make_ppm(160, 120, seed=33),
        EncodeParams(h=2, v=2, quality=80, optimize=True, restart_interval=3),
    )
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("frame",))
    cs, planes = decode_frame_sharded(data, mesh)
    _, expect = decode_coefficients(data, entropy="serial")
    assert set(planes) == set(expect)
    for cid in expect:
        np.testing.assert_array_equal(planes[cid], expect[cid])


def test_frame_sharded_decoder_is_cached_across_frames():
    """Frames 2..N of a stream must reuse frame 1's compiled executable
    (VERDICT r2 weak #4: a fresh closure per call defeated the jit
    cache).  Same-shaped frames hit the lru cache; the repeat decode
    runs >=10x faster than the compile call."""
    import time

    from jax.sharding import Mesh
    from jpeg_tpu.encoder import EncodeParams, encode_jpeg
    from jpeg_tpu.parallel import sharding
    from refbin import make_ppm

    params = EncodeParams(h=2, v=2, quality=80, restart_interval=3,
                          optimize=False, exact=False)
    frames = [
        encode_jpeg(make_ppm(160, 120, seed=40 + i), params) for i in range(3)
    ]
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("frame",))
    sharding._cached_frame_decoder.cache_clear()
    t0 = time.perf_counter()
    sharding.decode_frame_sharded(frames[0], mesh)
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    for f in frames[1:]:
        sharding.decode_frame_sharded(f, mesh)
    per_frame = (time.perf_counter() - t0) / (len(frames) - 1)
    info = sharding._cached_frame_decoder.cache_info()
    assert info.hits >= len(frames) - 1, info
    assert per_frame < first / 10, (first, per_frame)


def test_single_frame_sharded_with_padding_lanes():
    """Segment count not divisible by the axis: empty lanes pad it."""
    from jax.sharding import Mesh
    from jpeg_tpu.api import decode_coefficients
    from jpeg_tpu.encoder import EncodeParams, encode_jpeg
    from jpeg_tpu.parallel.sharding import decode_frame_sharded
    from refbin import make_pgm

    data = encode_jpeg(
        make_pgm(72, 56, seed=8),
        EncodeParams(quality=70, optimize=False, restart_interval=5),
    )
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("frame",))
    cs, planes = decode_frame_sharded(data, mesh)
    _, expect = decode_coefficients(data, entropy="serial")
    for cid in expect:
        np.testing.assert_array_equal(planes[cid], expect[cid])


def test_sharded_stream_decode_region_placement():
    """Sharded stream decode with the Pallas lane-region placement
    (interpret mode) must equal the scatter-placement shards exactly."""
    from jpeg_tpu.encoder import EncodeParams, encode_jpeg
    from jpeg_tpu.entropy.lockstep_jax import _max_steps_for
    from jpeg_tpu.entropy.place_pallas import placement_eligible
    from jpeg_tpu.models.device_decode import DeviceDecoder
    from jpeg_tpu.parallel.sharding import make_mesh, make_sharded_stream_decoder
    from refbin import make_ppm

    params = EncodeParams(h=2, v=2, quality=75, optimize=False,
                          restart_interval=2, exact=False)
    jpegs = [encode_jpeg(make_ppm(64, 32, seed=200 + i), params)
             for i in range(4)]
    dec = DeviceDecoder.for_stream(jpegs[0])
    assert placement_eligible(dec.plan, dec.ri, dec.segs_per_frame)
    prepared = dec.prepare(jpegs)
    assert prepared[0] in ("mat", "mats", "flat")
    if prepared[0] == "flat":
        buf, starts, nbits, qts = prepared[1:]
        idx = starts[:, None] + np.arange(dec.wn, dtype=np.int32)[None, :]
        words = np.asarray(buf)[np.minimum(idx, buf.shape[0] - 1)]
    else:
        words, _, nbits, qts = prepared[1:]
    steps = _max_steps_for(nbits.astype(np.int64), dec.plan, dec.ri,
                           optimistic=False)
    mesh = make_mesh(8)
    scatter = make_sharded_stream_decoder(
        dec.plan, dec.geom, mesh, 4, dec.segs_per_frame, steps)
    region = make_sharded_stream_decoder(
        dec.plan, dec.geom, mesh, 4, dec.segs_per_frame, steps,
        place_ri=dec.ri, interpret=True)
    px_s, st_s = scatter(words, nbits, qts)
    px_r, st_r = region(words, nbits, qts)
    assert not np.asarray(st_s).any() and not np.asarray(st_r).any()
    np.testing.assert_array_equal(np.asarray(px_r), np.asarray(px_s))
