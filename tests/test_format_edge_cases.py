"""Format-layer edge cases: 16-bit quant tables, inter-scan DHT updates,
fill bytes, comments, trailing garbage."""

import struct

import numpy as np
import pytest

import jpeg_tpu
from jpeg_tpu.constants import DEFAULT_HTABLES, ZIGZAG
from jpeg_tpu.encoder import EncodeParams, encode_jpeg
from jpeg_tpu.format.parse import parse_codestream
from refbin import ensure_reference_binaries, make_pgm, make_ppm, ref_decode

pytestmark = pytest.mark.skipif(
    ensure_reference_binaries() is None, reason="reference toolchain unavailable"
)


def test_16bit_qtable_pq1():
    """Rewrite a DQT segment with Pq=1 (16-bit entries): both decoders
    must handle it identically (decoder.c:46-58)."""
    jpg = encode_jpeg(make_pgm(24, 24, seed=110), EncodeParams(h=1, v=1, quality=75))
    cs = parse_codestream(jpg)
    q = cs.qtables[0]

    # Build a Pq=1 DQT segment with the same values.
    body = bytes([(1 << 4) | 0]) + b"".join(
        struct.pack(">H", int(q[ZIGZAG[i]])) for i in range(64)
    )
    new_dqt = b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body

    # Replace the original DQT (first FFDB segment).
    i = jpg.find(b"\xff\xdb")
    seg_len = (jpg[i + 2] << 8) | jpg[i + 3]
    patched = jpg[:i] + new_dqt + jpg[i + 2 + seg_len :]

    golden = ref_decode(patched)
    assert golden == ref_decode(jpg)  # same values, different precision
    assert jpeg_tpu.decode_jpeg(patched, exact=True).to_pnm() == golden


def test_dht_between_scans():
    """DHT between two scans: the second scan must use the NEW tables
    (per-scan table snapshots in the parser)."""
    from jpeg_tpu.entropy.encode import pack_scan, symbolize_scan
    from jpeg_tpu.format import emit
    from jpeg_tpu.geometry import Component, FrameGeometry, ScanInfo, with_block_grid
    from jpeg_tpu.tables import HuffSpec, derive_table, optimize_table

    # Nf must be 1, 3 or 4: the reference's frame_to_rgb aborts otherwise
    # (frame.c:240).
    geom = with_block_grid(
        FrameGeometry(
            precision=8,
            height=16,
            width=16,
            components=tuple(
                Component(cid=i, h=1, v=1, tq=0, td=0, ta=0) for i in (1, 2, 3)
            ),
        )
    )
    rng = np.random.default_rng(42)
    planes = {}
    for c in geom.components:
        p = np.zeros((c.n_blocks, 64), dtype=np.int32)
        p[:, 0] = rng.integers(50, 150, size=c.n_blocks)  # keep RGB sane
        p[:, 1] = rng.integers(-9, 9, size=c.n_blocks)
        planes[c.cid] = p

    default = {k: HuffSpec.from_pair(v) for k, v in DEFAULT_HTABLES.items()}
    # Scan 1 (component 1): default tables.
    info1 = ScanInfo(component_ids=(1,), td=(0,), ta=(0,))
    t1 = {k: derive_table(s) for k, s in default.items()}
    segs1 = pack_scan(symbolize_scan(planes, geom, info1), t1)

    # Scans 2+3 (components 2, 3): OPTIMIZED table 0 redefined in between.
    from jpeg_tpu.entropy.encode import histogram

    info2 = ScanInfo(component_ids=(2,), td=(0,), ta=(0,))
    info3 = ScanInfo(component_ids=(3,), td=(0,), ta=(0,))
    sym2 = symbolize_scan(planes, geom, info2)
    sym3 = symbolize_scan(planes, geom, info3)
    freq = histogram(sym2)
    f3 = histogram(sym3)
    for k in freq:
        freq[k] = freq[k] + f3.get(k, 0)
    spec_dc = optimize_table(freq[(0, 0)])
    spec_ac = optimize_table(freq[(1, 0)])
    t2 = dict(t1)
    t2[(0, 0)] = derive_table(spec_dc)
    t2[(1, 0)] = derive_table(spec_ac)
    segs2 = pack_scan(sym2, t2)
    segs3 = pack_scan(sym3, t2)

    qt = np.ones((4, 64), dtype=np.uint16) * 4
    out = bytearray()
    out += emit.emit_soi()
    out += emit.emit_dqt(qt[0], 0)
    out += emit.emit_sof0(geom)
    out += emit.emit_dht(default[(0, 0)], 0, 0)
    out += emit.emit_dht(default[(1, 0)], 1, 0)
    out += emit.emit_sos(info1)
    out += emit.emit_scan_body(segs1)
    out += emit.emit_dht(spec_dc, 0, 0)  # REDEFINE table 0 between scans
    out += emit.emit_dht(spec_ac, 1, 0)
    out += emit.emit_sos(info2)
    out += emit.emit_scan_body(segs2)
    out += emit.emit_sos(info3)
    out += emit.emit_scan_body(segs3)
    out += emit.emit_eoi()
    jpg = bytes(out)

    golden = ref_decode(jpg)
    assert jpeg_tpu.decode_jpeg(jpg, exact=True).to_pnm() == golden
    _, dec = jpeg_tpu.decode_coefficients(jpg)
    for cid in planes:
        np.testing.assert_array_equal(dec[cid], planes[cid])


def test_fill_bytes_and_comment_and_garbage():
    """Fill 0xFFs before markers, a COM segment, and trailing garbage
    after EOI -- all tolerated like the reference (io.c:186-220,
    decoder.c:403-431, 602-612)."""
    jpg = encode_jpeg(make_ppm(24, 16, seed=111), EncodeParams(h=1, v=1))
    com = b"\xff\xfe" + struct.pack(">H", 2 + 5) + b"hello"
    i = jpg.find(b"\xff\xc0")
    patched = jpg[:i] + b"\xff\xff\xff" + com + jpg[i:] + b"garbage!"
    golden = ref_decode(patched)
    img = jpeg_tpu.decode_jpeg(patched, exact=True)
    assert img.to_pnm() == golden
    assert img.codestream.comments == [b"hello"]
    assert img.codestream.trailing_garbage == len(b"garbage!")


def test_rst_before_sos_is_noop():
    """A restart marker BEFORE any SOS is a no-op in the reference (the
    scan struct's Ns is still 0, decoder.c:479 + 270-272: read_ecs
    processes zero macroblocks and the marker walk continues) -- found
    by the fuzz sweep as a reject-vs-accept divergence.  Both with a
    later real scan and with no scan at all (flat zero-coefficient
    frame), output must stay byte-identical to the reference."""
    jpg = encode_jpeg(make_ppm(24, 16, seed=13), EncodeParams(h=2, v=2))
    i = jpg.find(b"\xff\xda")
    with_rst = jpg[:i] + b"\xff\xd4" + jpg[i:]
    assert jpeg_tpu.decode_jpeg(with_rst, exact=True).to_pnm() == ref_decode(
        with_rst
    )
    # drop the scan entirely: RST + EOI after the headers
    no_scan = jpg[:i] + b"\xff\xd4\xff\xd9"
    assert jpeg_tpu.decode_jpeg(no_scan, exact=True).to_pnm() == ref_decode(
        no_scan
    )


def test_dqt_dht_do_while_semantics():
    """The reference's multi-table DQT/DHT loops are DO-WHILE
    (decoder.c:522-526, 586-590): at least one table parses even when
    the declared length is 0, and parsing resumes from the table's
    actual end, not pos+len.  Fuzz-found: zeroing a DQT length made us
    skip the table the reference consumed, desyncing every following
    marker."""
    jpg = encode_jpeg(make_ppm(24, 16, seed=21), EncodeParams(h=2, v=2))
    assert jpg[2:4] == b"\xff\xdb"
    mut = jpg[:4] + b"\x00\x00" + jpg[6:]  # DQT length := 0
    assert jpeg_tpu.decode_jpeg(mut, exact=True).to_pnm() == ref_decode(mut)


def test_undeclared_scan_component_skipped():
    """A scan referencing a component id the SOF never declared: the
    reference's component[Cs] exists with H = V = 0 (init_component), so
    the id contributes no blocks and consumes no bits -- DEFINED
    behavior, byte-pinned here.  (Fuzz-found as a KeyError crash.)"""
    jpg = encode_jpeg(make_ppm(24, 16, seed=22), EncodeParams(h=2, v=2))
    i = jpg.find(b"\xff\xda")
    head = bytearray(jpg[i:i + 14])
    # SOS payload: len(2) Ns(1) then [Cs Td/Ta] triples; rewrite the
    # THIRD component's id (3 -> 9)
    assert head[5] == 1 and head[7] == 2 and head[9] == 3
    head[9] = 9
    mut = jpg[:i] + bytes(head) + jpg[i + 14:]
    assert jpeg_tpu.decode_jpeg(mut, exact=True).to_pnm() == ref_decode(mut)
