"""Device-side entropy encode vs the NumPy reference path: the packed
segments must be byte-identical."""

import numpy as np
import pytest

import jpeg_tpu
from jpeg_tpu.constants import DEFAULT_HTABLES
from jpeg_tpu.encoder import EncodeParams, encode_jpeg
from jpeg_tpu.entropy.encode import build_visit_order, pack_scan, symbolize_scan
from jpeg_tpu.entropy.encode_jax import encode_scan_device, finalize_segment, pack_scan_device
from jpeg_tpu.geometry import ScanInfo
from jpeg_tpu.tables import HuffSpec, derive_table
from refbin import ensure_reference_binaries, make_ppm

pytestmark = pytest.mark.skipif(
    ensure_reference_binaries() is None, reason="reference toolchain unavailable"
)


def _device_pack(planes, geom, info, tables, ri):
    """Run the device encoder; return stuffed segment byte strings."""
    comp_idx, block_seq = build_visit_order(geom, info)
    from jpeg_tpu.constants import ZIGZAG

    stacked = [np.asarray(planes[cid], np.int64) for cid in info.component_ids]
    zz = np.empty((comp_idx.size, 64), np.int64)
    for j in range(len(info.component_ids)):
        sel = comp_idx == j
        zz[sel] = stacked[j][block_seq[sel]][:, ZIGZAG]

    bpm = comp_idx.size // geom.n_mcus if info.ns > 1 else (
        geom.by_id(info.component_ids[0]).h * geom.by_id(info.component_ids[0]).v
    )
    mcu_of = np.arange(comp_idx.size) // bpm
    seg_of = mcu_of // ri if ri else np.zeros_like(mcu_of)

    # differential DC per component with per-segment reset
    dc = zz[:, 0].copy()
    for j in range(len(info.component_ids)):
        sel = np.nonzero(comp_idx == j)[0]
        seq = dc[sel]
        prev = np.concatenate(([0], seq[:-1]))
        iv = seg_of[sel]
        first = np.concatenate(([True], iv[1:] != iv[:-1]))
        zz[sel, 0] = np.where(first, seq, seq - prev)

    keys = []
    for td in info.td:
        if (0, td) not in keys:
            keys.append((0, td))
    for ta in info.ta:
        if (1, ta) not in keys:
            keys.append((1, ta))
    tmap = {k: i for i, k in enumerate(keys)}
    ehufco = np.stack([tables[k].ehufco for k in keys])
    ehufsi = np.stack([tables[k].ehufsi for k in keys])
    td = np.asarray([tmap[(0, info.td[j])] for j in range(info.ns)])
    ta = np.asarray([tmap[(1, info.ta[j])] for j in range(info.ns)])

    n_segments = int(seg_of.max()) + 1
    words_per_seg = (comp_idx.size * 68 * 32 // 32) // n_segments + 64

    words, seg_bits, hist = encode_scan_device(
        zz.astype(np.int32),
        td[comp_idx].astype(np.int32),
        ta[comp_idx].astype(np.int32),
        ehufco.astype(np.int32),
        ehufsi.astype(np.int32),
        seg_of.astype(np.int32),
        n_segments,
        int(words_per_seg),
    )
    words = np.asarray(words)
    seg_bits = np.asarray(seg_bits)
    return [
        finalize_segment(words[s], int(seg_bits[s])) for s in range(n_segments)
    ]


@pytest.mark.parametrize("ri", [0, 2, 5])
def test_device_pack_matches_numpy(ri):
    from jpeg_tpu.format.parse import parse_codestream

    jpg = encode_jpeg(
        make_ppm(48, 32, seed=90),
        EncodeParams(h=2, v=2, quality=80, optimize=False, restart_interval=ri),
    )
    cs = parse_codestream(jpg)
    geom = cs.geometry
    _, planes = jpeg_tpu.decode_coefficients(jpg)

    info = ScanInfo(
        component_ids=tuple(c.cid for c in geom.components),
        td=tuple(c.td for c in geom.components),
        ta=tuple(c.ta for c in geom.components),
    )
    tables = {
        k: derive_table(HuffSpec.from_pair(v)) for k, v in DEFAULT_HTABLES.items()
    }

    symbols = symbolize_scan(planes, geom, info, ri)
    expected = pack_scan(symbols, tables, ri)
    got = pack_scan_device(planes, geom, info, tables, ri)
    assert len(got) == len(expected)
    for i, (a, b) in enumerate(zip(got, expected)):
        assert a == b, f"segment {i}: {len(a)} vs {len(b)} bytes"


@pytest.mark.parametrize("ri", [0, 3])
def test_encoder_jax_backend_byte_identical(ri):
    """encode_jpeg(entropy_backend='jax') == the numpy backend byte-for-byte."""
    pnm = make_ppm(48, 32, seed=91)
    a = encode_jpeg(pnm, EncodeParams(h=2, v=1, quality=80, restart_interval=ri))
    b = encode_jpeg(
        pnm,
        EncodeParams(h=2, v=1, quality=80, restart_interval=ri, entropy_backend="jax"),
    )
    assert a == b


def test_encoder_jax_backend_missing_code():
    """12-bit content whose DC categories exceed the default tables:
    both backends must raise the same clean error."""
    # checkerboard of 8x8 tiles at full 12-bit swing -> huge DC diffs
    tile = np.indices((48, 48)).sum(axis=0) // 8 % 2
    img = (tile * 4095).astype(">u2")
    pnm = b"P5\n48 48\n4095\n" + np.repeat(img, 1, axis=0).tobytes()
    for backend in ("numpy", "jax"):
        with pytest.raises(jpeg_tpu.UnsupportedError):
            encode_jpeg(
                pnm,
                EncodeParams(
                    h=1, v=1, quality=100, optimize=False, entropy_backend=backend
                ),
            )


def test_device3_matches_device2_random():
    """v3 (block-lane generator) vs v2 (item-stream): identical words,
    seg_bits, histogram, and overflow semantics on random blocks."""
    import jax.numpy as jnp

    from jpeg_tpu.entropy.encode_jax import (
        encode_scan_device2,
        encode_scan_device3,
    )

    rng = np.random.default_rng(42)
    B, ICAP, NZ = 48, 20, 12
    for trial in range(3):
        nseg = int(rng.integers(1, 5))
        T = int(rng.integers(1, 5))
        zz = np.zeros((B, 64), np.int32)
        for b in range(B):
            k = int(rng.integers(0, 9))
            cols = rng.choice(np.arange(1, 64), size=k, replace=False)
            zz[b, cols] = rng.integers(-255, 256, k)
        zz[:, 0] = rng.integers(-100, 101, B)
        dc_tab = rng.integers(0, T, B).astype(np.int32)
        ac_tab = rng.integers(0, T, B).astype(np.int32)
        ehufsi = rng.integers(2, 16, (T, 256)).astype(np.int32)
        ehufco = (
            rng.integers(0, 1 << 15, (T, 256)) & ((1 << ehufsi) - 1)
        ).astype(np.int32)
        seg_of = np.maximum.accumulate(
            np.sort(rng.integers(0, nseg, B))
        ).astype(np.int32)
        seg_of[0] = 0
        nseg = int(seg_of.max()) + 1
        order = rng.permutation(B).astype(np.int32)
        wps = 512
        w2, sb2, ov2, m2 = encode_scan_device2(
            jnp.asarray(zz), jnp.asarray(np.take(dc_tab, order)),
            jnp.asarray(np.take(ac_tab, order)),
            jnp.asarray(ehufco), jnp.asarray(ehufsi),
            jnp.asarray(seg_of), nseg, wps, B * 68,
            order=jnp.asarray(order), nz_cap=63,
        )
        w3, sb3, ov3, m3 = encode_scan_device3(
            jnp.asarray(zz), jnp.asarray(dc_tab), jnp.asarray(ac_tab),
            jnp.asarray(ehufco), jnp.asarray(ehufsi),
            jnp.asarray(seg_of), nseg, wps, ICAP,
            order=jnp.asarray(order), nz_cap=NZ, wpb_cap=24,
        )
        assert int(ov3) == 0
        sb2, sb3 = np.asarray(sb2), np.asarray(sb3)
        assert (sb2 == sb3).all()
        w2, w3 = np.asarray(w2), np.asarray(w3)
        for s in range(nseg):
            nw = (sb2[s] + 31) // 32
            assert (w2[s, :nw] == w3[s, :nw]).all()
        assert bool(m2) == bool(m3)


def test_device3_overflow_flags():
    """Each capacity bound trips its own overflow bit."""
    import jax.numpy as jnp

    from jpeg_tpu.entropy.encode_jax import encode_scan_device3

    rng = np.random.default_rng(9)
    B, T = 32, 2
    zz = np.zeros((B, 64), np.int32)
    for b in range(B):
        cols = rng.choice(np.arange(1, 64), size=6, replace=False)
        zz[b, cols] = rng.integers(-40, 41, 6)
    zz[:, 0] = rng.integers(-30, 31, B)
    args = (
        jnp.asarray(zz),
        jnp.asarray(rng.integers(0, T, B).astype(np.int32)),
        jnp.asarray(rng.integers(0, T, B).astype(np.int32)),
    )
    ehufsi = rng.integers(2, 16, (T, 256)).astype(np.int32)
    ehufco = (
        rng.integers(0, 1 << 15, (T, 256)) & ((1 << ehufsi) - 1)
    ).astype(np.int32)
    tabs = (jnp.asarray(ehufco), jnp.asarray(ehufsi))
    seg = jnp.asarray(np.zeros(B, np.int32))
    ok = encode_scan_device3(*args, *tabs, seg, 1, 2048, 20,
                             nz_cap=12, wpb_cap=24)
    assert int(ok[2]) == 0
    assert int(encode_scan_device3(*args, *tabs, seg, 1, 2048, 4,
                                   nz_cap=12, wpb_cap=24)[2]) & 1
    assert int(encode_scan_device3(*args, *tabs, seg, 1, 2, 20,
                                   nz_cap=12, wpb_cap=24)[2]) & 2
    assert int(encode_scan_device3(*args, *tabs, seg, 1, 2048, 20,
                                   nz_cap=4, wpb_cap=24)[2]) & 4
    assert int(encode_scan_device3(*args, *tabs, seg, 1, 2048, 20,
                                   nz_cap=12, wpb_cap=1)[2]) & 8
