"""Batched on-device encoder vs the host encoder and the reference decoder.

Contract (fast dense path): quantized coefficients within +-1 of the host
fast path (different XLA fusion orders round borderline FDCT values
differently), streams decodable by the reference decoder bit-exactly to
our own decoder's output, correct markers/structure.
"""

import numpy as np
import pytest

import jpeg_tpu
from jpeg_tpu.encoder import EncodeParams, encode_jpeg
from jpeg_tpu.errors import UnsupportedError
from jpeg_tpu.models.device_encode import DeviceEncoder
from jpeg_tpu.utils.pnm import read_pnm
from refbin import ensure_reference_binaries, make_pgm, make_ppm, ref_decode

pytestmark = pytest.mark.skipif(
    ensure_reference_binaries() is None, reason="reference toolchain unavailable"
)


def _coeff_maxdiff(a_jpg: bytes, b_jpg: bytes) -> int:
    _, a = jpeg_tpu.decode_coefficients(a_jpg, entropy="serial")
    _, b = jpeg_tpu.decode_coefficients(b_jpg, entropy="serial")
    return max(int(np.abs(a[c].astype(int) - b[c].astype(int)).max()) for c in a)


def test_device_encode_color_batch():
    params = EncodeParams(h=2, v=2, quality=80, optimize=False,
                          restart_interval=3, exact=False)
    ppms = [make_ppm(96, 72, seed=s) for s in range(3)]
    pix = np.stack([read_pnm(p).data for p in ppms]).astype(np.uint8)
    enc = DeviceEncoder.for_config(72, 96, 3, params)
    outs = enc.encode_batch(pix)
    for out, ppm in zip(outs, ppms):
        host = encode_jpeg(ppm, params)
        assert _coeff_maxdiff(out, host) <= 1
        # the reference decoder accepts the stream and agrees with ours
        assert ref_decode(out) == jpeg_tpu.decode_jpeg(out).to_pnm()


def test_device_encode_gray_and_422():
    for comps, w, h, p in (
        (1, 48, 40, EncodeParams(h=1, v=1, quality=75, optimize=False,
                                 restart_interval=2, exact=False)),
        (3, 80, 64, EncodeParams(h=2, v=1, quality=60, optimize=False,
                                 restart_interval=5, exact=False)),
    ):
        maker = make_pgm if comps == 1 else make_ppm
        pnms = [maker(w, h, seed=s) for s in range(2)]
        pix = np.stack([read_pnm(x).data for x in pnms]).astype(np.uint8)
        enc = DeviceEncoder.for_config(h, w, comps, p)
        for out, pnm in zip(enc.encode_batch(pix), pnms):
            assert _coeff_maxdiff(out, encode_jpeg(pnm, p)) <= 1
            assert ref_decode(out) == jpeg_tpu.decode_jpeg(out).to_pnm()


def test_device_encode_items_cap_retry():
    """An undersized item budget must grow and still produce valid output."""
    params = EncodeParams(h=1, v=1, quality=95, optimize=False,
                          restart_interval=1, exact=False)
    pnms = [make_pgm(256, 256, seed=7)]
    pix = np.stack([read_pnm(x).data for x in pnms]).astype(np.uint8)
    enc = DeviceEncoder.for_config(256, 256, 1, params)
    enc.items_per_block = 1  # force the overflow-retry path
    out = enc.encode_batch(pix)[0]
    assert enc.items_per_block > 1
    assert ref_decode(out) == jpeg_tpu.decode_jpeg(out).to_pnm()


def test_device_encode_rejects_unsupported_modes():
    with pytest.raises(UnsupportedError):
        DeviceEncoder.for_config(32, 32, 3, EncodeParams(optimize=True,
                                                         restart_interval=2))
    with pytest.raises(UnsupportedError):
        DeviceEncoder.for_config(32, 32, 3, EncodeParams(optimize=False,
                                                         restart_interval=0))


def test_device_encode_roundtrips_through_device_decoder():
    """The streaming encoder's output feeds the streaming decoder."""
    from jpeg_tpu.models.device_decode import DeviceDecoder

    params = EncodeParams(h=2, v=2, quality=85, optimize=False,
                          restart_interval=2, exact=False)
    ppms = [make_ppm(64, 48, seed=20 + s) for s in range(3)]
    pix = np.stack([read_pnm(p).data for p in ppms]).astype(np.uint8)
    enc = DeviceEncoder.for_config(48, 64, 3, params)
    jpegs = enc.encode_batch(pix)
    dec = DeviceDecoder.for_stream(jpegs[0])
    out = np.asarray(dec.decode_batch(jpegs, chunk=2))
    for i, jpg in enumerate(jpegs):
        golden = jpeg_tpu.decode_jpeg(jpg, exact=True).pixels()
        assert np.abs(out[i].astype(int) - golden.astype(int)).max() <= 1


def test_device_encode_stream_optimized_tables():
    """Fixed per-stream optimized tables: smaller output, decodes the
    same, round-trips through the reference decoder."""
    params = EncodeParams(h=2, v=2, quality=80, optimize=False,
                          restart_interval=3, exact=False)
    ppms = [make_ppm(96, 72, seed=130 + s) for s in range(3)]
    pix = np.stack([read_pnm(p).data for p in ppms]).astype(np.uint8)
    tables = DeviceEncoder.tables_for_stream(ppms[0], params)
    enc_opt = DeviceEncoder.for_config(72, 96, 3, params, htables=tables)
    enc_def = DeviceEncoder.for_config(72, 96, 3, params)
    outs_opt = enc_opt.encode_batch(pix)
    outs_def = enc_def.encode_batch(pix)
    assert sum(map(len, outs_opt)) < sum(map(len, outs_def))
    for o in outs_opt:
        assert ref_decode(o) == jpeg_tpu.decode_jpeg(o).to_pnm()
    # the optimized stream feeds the batch decoder (shared tables)
    from jpeg_tpu.models.device_decode import DeviceDecoder

    dec = DeviceDecoder.for_stream(outs_opt[0])
    px = np.asarray(dec.decode_batch(outs_opt, chunk=2))
    for i in range(3):
        golden = jpeg_tpu.decode_jpeg(outs_opt[i], exact=True).pixels()
        assert np.abs(px[i].astype(int) - golden.astype(int)).max() <= 1


def test_device_encode_12bit_with_stream_tables():
    """12-bit streaming encode: impossible with the default tables (the
    reference encoder fails too), works with per-stream optimized tables
    seeded for the 12-bit symbol range."""
    params = EncodeParams(h=2, v=1, quality=85, optimize=False,
                          restart_interval=2, exact=False)
    ppms = [make_ppm(48, 32, seed=140 + s, maxval=4095) for s in range(2)]
    pix = np.stack([read_pnm(p).data for p in ppms]).astype(np.uint16)
    tables = DeviceEncoder.tables_for_stream(ppms[0], params)
    enc = DeviceEncoder.for_config(32, 48, 3, params, htables=tables,
                                   precision=12)
    outs = enc.encode_batch(pix)
    for o, p in zip(outs, ppms):
        # our decoder agrees with the reference decoder bit-exactly
        assert ref_decode(o) == jpeg_tpu.decode_jpeg(o, exact=True).to_pnm()
        # and the pixels round-trip close to the source
        src = read_pnm(p).data[..., :3]
        dec = jpeg_tpu.decode_jpeg(o, exact=True).pixels()
        assert np.abs(dec.astype(int) - src.astype(int)).mean() < 64


def test_device_encode_phased_schedule():
    """Slot-scan narrowing: chunk 1 learns the n_sym histogram (flat),
    chunk 2 runs the phased schedule; phased output must be BYTE-identical
    to a flat encode of the same pixels, and content drift past the
    learned budgets must relearn instead of corrupting."""
    params = EncodeParams(h=2, v=2, quality=80, optimize=False,
                          restart_interval=3, exact=False)
    ppms = [make_ppm(96, 72, seed=160 + s) for s in range(4)]
    pix = np.stack([read_pnm(p).data for p in ppms]).astype(np.uint8)
    enc = DeviceEncoder.for_config(72, 96, 3, params)
    enc.encode_batch(pix[:2])  # learns the histogram on a flat pass
    assert enc.nsym_counts is not None
    assert enc._slot_phases(2), "learned schedule should be non-trivial"
    phased = enc.encode_batch(pix[2:])
    assert enc._last_phased
    flat = DeviceEncoder.for_config(72, 96, 3, params).encode_batch(pix[2:])
    assert [bytes(a) for a in phased] == [bytes(a) for a in flat]
    for o in phased:
        assert ref_decode(o) == jpeg_tpu.decode_jpeg(o).to_pnm()
    # drift: a schedule far too tight must trip overflow bit 0, relearn,
    # and still produce correct output via the flat redo
    enc.nsym_counts = np.zeros(70, np.int64)
    enc.nsym_counts[1] = 1000  # claims every block is DC+EOB only
    enc._sched_cache.clear()
    redo = enc.encode_batch(pix[2:])
    assert [bytes(a) for a in redo] == [bytes(a) for a in flat]


def test_device_encode_two_pass_optimize():
    """optimize=True: on-device histogram (MXU dry pass) + per-batch K.2
    tables.  Output must be smaller than the default tables, decode on
    the reference decoder, and round-trip through our decoder."""
    params = EncodeParams(h=2, v=2, quality=80, optimize=False,
                          restart_interval=3, exact=False)
    ppms = [make_ppm(96, 72, seed=150 + s) for s in range(3)]
    pix = np.stack([read_pnm(p).data for p in ppms]).astype(np.uint8)
    enc = DeviceEncoder.for_config(72, 96, 3, params)
    o_def = enc.encode_batch(pix)
    o_opt = enc.encode_batch(pix, optimize=True)
    assert sum(map(len, o_opt)) < sum(map(len, o_def))
    for o, p in zip(o_opt, ppms):
        assert ref_decode(o) == jpeg_tpu.decode_jpeg(o).to_pnm()
        assert _coeff_maxdiff(o, encode_jpeg(p, params)) <= 1
