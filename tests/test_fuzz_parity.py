"""Deterministic corruption fuzzing: the serial engine mirrors the
reference decoder's graceful-degradation behavior bit for bit.

The reference tolerates many corruptions (garbage-byte skip in
read_marker io.c:196-214, NULL-block discard for truncated buffers
decoder.c:339-347, trailing-garbage report decoder.c:604-609) and exits
nonzero on the rest.  For every mutation: when the reference decoder
succeeds, our serial decode must produce byte-identical PNM output; when
it fails, we must raise a JpegError -- and we must never hang or crash
either way.
"""

import subprocess
import tempfile
from pathlib import Path

import numpy as np
import pytest

import jpeg_tpu
from jpeg_tpu.encoder import EncodeParams, encode_jpeg
from jpeg_tpu.errors import JpegError
from jpeg_tpu.utils.metrics import default_metrics
from refbin import ensure_reference_binaries, make_ppm

pytestmark = [
    pytest.mark.slow,  # quick tier: -m 'not slow'
    pytest.mark.skipif(
        ensure_reference_binaries() is None,
        reason="reference toolchain unavailable",
    ),
]


def _ref_decode_or_none(jpeg_bytes: bytes):
    build = ensure_reference_binaries()
    with tempfile.TemporaryDirectory() as td:
        inp = Path(td) / "in.jpg"
        out = Path(td) / "out.pnm"
        inp.write_bytes(jpeg_bytes)
        res = subprocess.run(
            [str(build / "decoder"), str(inp), str(out)],
            capture_output=True,
            timeout=30,
        )
        if res.returncode != 0 or not out.exists():
            return None
        return out.read_bytes()


def _mutations(jpg: bytes):
    rng = np.random.default_rng(2026)
    n = len(jpg)
    muts = []
    # truncations at assorted depths (headers, mid-ECS, near EOI)
    for frac in (0.05, 0.3, 0.5, 0.7, 0.9, 0.99):
        muts.append(("trunc", jpg[: int(n * frac)]))
    # single byte flips across the file
    for _ in range(10):
        i = int(rng.integers(2, n - 2))
        b = bytearray(jpg)
        b[i] ^= int(rng.integers(1, 256))
        muts.append((f"flip@{i}", bytes(b)))
    # garbage insertions before a marker and at the tail
    soso = jpg.find(b"\xff\xda")
    muts.append(("garbage-pre-sos", jpg[:soso] + b"\x12\x34\x56" + jpg[soso:]))
    muts.append(("trailing-garbage", jpg + b"\x00\xde\xad\xbe\xef"))
    # duplicated / removed restart marker
    rst = jpg.find(b"\xff\xd0")
    if rst >= 0:
        muts.append(("dup-rst", jpg[:rst] + b"\xff\xd0" + jpg[rst:]))
        muts.append(("del-rst", jpg[:rst] + jpg[rst + 2:]))
    return muts


def test_fuzz_corruption_parity():
    jpg = encode_jpeg(
        make_ppm(64, 48, seed=77),
        EncodeParams(h=2, v=2, quality=80, restart_interval=2, optimize=False),
    )
    agree = 0
    for name, mut in _mutations(jpg):
        golden = _ref_decode_or_none(mut)
        ub0 = default_metrics.counters["serial.reference_ub"]
        try:
            ours = jpeg_tpu.decode_jpeg(mut, entropy="serial").to_pnm()
        except JpegError:
            ours = None
        except Exception as e:  # noqa: BLE001 - anything else is a bug
            raise AssertionError(f"{name}: non-JpegError {type(e).__name__}: {e}")
        if default_metrics.counters["serial.reference_ub"] > ub0:
            # The mutation drove the reference out of bounds (see
            # PARITY.md "Known deviations"): its output/exit is
            # layout-dependent, so only crash-freedom is checkable.
            continue
        if golden is not None:
            assert ours == golden, f"{name}: outputs differ"
            agree += 1
        else:
            assert ours is None, f"{name}: we decoded what the reference rejects"
    # the corpus must actually exercise the graceful path
    assert agree >= 2, f"only {agree} mutations decoded gracefully"


def test_fuzz_speculative_never_crashes():
    """The speculative engine may DEVIATE on invalid input (documented
    contract: parallel engines deviate only on invalid streams) but must
    never crash, hang, or raise anything but JpegError; on streams it
    resolves it must still be self-consistent (valid coefficient
    shapes)."""
    jpg = encode_jpeg(
        make_ppm(160, 120, seed=78),
        EncodeParams(h=2, v=2, quality=80, restart_interval=0, optimize=False),
    )
    for name, mut in _mutations(jpg):
        try:
            img = jpeg_tpu.decode_jpeg(mut, entropy="speculative")
            assert img.frame.shape[-1] >= 1, name
        except JpegError:
            pass
        except Exception as e:  # noqa: BLE001 - anything else is a bug
            raise AssertionError(
                f"{name}: non-JpegError {type(e).__name__}: {e}"
            )


def test_oversubscribed_dht_rejected():
    """A DHT with >255 total symbols deterministically aborts the
    reference (`K < 256` assertion, huffman.c:59,67) at PARSE time, even
    when no scan uses the table; we mirror the reject (format/parse.py).
    Found by tools/fuzz_sweep.py (a bit flip in an L count)."""
    jpg = encode_jpeg(make_ppm(16, 16, seed=3), EncodeParams(h=1, v=1))
    # 16 counts of 16 = 256 symbols, values all zero
    dht = (b"\xff\xc4" + (2 + 1 + 16 + 256).to_bytes(2, "big") + b"\x01"
           + bytes([16] * 16) + bytes(256))
    i = jpg.find(b"\xff\xda")
    mut = jpg[:i] + dht + jpg[i:]
    assert _ref_decode_or_none(mut) is None, "reference accepted?!"
    with pytest.raises(JpegError):
        jpeg_tpu.decode_jpeg(mut, entropy="serial")


def test_reference_ub_classes_counted():
    """The two corrupt-stream classes that are UB in the reference
    (PARITY.md): our serial engine must keep decoding with identical bit
    consumption, drop the unplaceable writes, and fire the
    `serial.reference_ub` metric so harnesses know byte parity is off.
    """
    from jpeg_tpu.constants import DEFAULT_HTABLES
    from jpeg_tpu.tables import HuffSpec, derive_table

    # -- class (a): AC run past coefficient 63 (coeffs.c:247 OOB) -----
    # Build a gray 8x8 stream with implicit (K.3 default) tables whose
    # single block codes DC cat 0 then five ZRLs: i = 1+16*4+15 = 80.
    dc = derive_table(HuffSpec.from_pair(DEFAULT_HTABLES[(0, 0)]))
    ac = derive_table(HuffSpec.from_pair(DEFAULT_HTABLES[(1, 0)]))

    def code_of(tab, sym):
        return int(tab.ehufco[sym]), int(tab.ehufsi[sym])

    bits = []
    for sym, tab in [(0, dc)] + [(0xF0, ac)] * 5 + [(0x00, ac)]:
        c, n = code_of(tab, sym)
        bits += [(c >> k) & 1 for k in range(n - 1, -1, -1)]
    while len(bits) % 8:
        bits.append(1)  # flush padding
    ecs = bytes(
        sum(b << (7 - k) for k, b in enumerate(bits[i:i + 8]))
        for i in range(0, len(bits), 8)
    )
    stream = (
        b"\xff\xd8"
        + b"\xff\xdb\x00\x43\x00" + bytes([1] * 64)      # flat q=1 table
        + b"\xff\xc0\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
        + b"\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00"
        + ecs.replace(b"\xff", b"\xff\x00")
        + b"\xff\xd9"
    )
    ub0 = default_metrics.counters["serial.reference_ub"]
    img = jpeg_tpu.decode_jpeg(stream, entropy="serial")
    assert default_metrics.counters["serial.reference_ub"] > ub0
    assert img.frame.shape[:2] == (8, 8)

    # -- class (b): Ns=1 scan overrunning the component buffer --------
    # (decoder.c:274-302 has no bounds guard).  Encode 16x16 gray, then
    # shrink SOF's declared height to 8: the scan now carries 2 MCUs
    # more than the geometry holds.
    from refbin import make_pgm

    jpg = encode_jpeg(make_pgm(16, 16, seed=9), EncodeParams(h=1, v=1))
    sof = jpg.find(b"\xff\xc0")
    hi = sof + 5  # SOF payload: P(1) Y(2) -> height at sof+5..6
    mut = jpg[:hi] + (8).to_bytes(2, "big") + jpg[hi + 2:]
    ub0 = default_metrics.counters["serial.reference_ub"]
    img = jpeg_tpu.decode_jpeg(mut, entropy="serial")
    assert default_metrics.counters["serial.reference_ub"] > ub0
    assert img.frame.shape[:2] == (8, 16)


def _gray_stream_with_dc_table(counts, values, ecs_bits):
    """Minimal 8x8 grayscale JPEG with a custom DC table (AC = default
    K.3 luma, installed implicitly) and a hand-packed ECS."""
    bits = list(ecs_bits)
    while len(bits) % 8:
        bits.append(1)
    ecs = bytes(
        sum(b << (7 - k) for k, b in enumerate(bits[i:i + 8]))
        for i in range(0, len(bits), 8)
    )
    dht = (b"\xff\xc4" + (2 + 1 + 16 + len(values)).to_bytes(2, "big")
           + b"\x00" + bytes(counts) + bytes(values))
    return (
        b"\xff\xd8"
        + b"\xff\xdb\x00\x43\x00" + bytes([1] * 64)
        + dht
        + b"\xff\xc0\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
        + b"\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00"
        + ecs.replace(b"\xff", b"\xff\x00")
        + b"\xff\xd9"
    )


def test_dc_category_17_to_30_byte_matches_reference():
    """A corrupt DC table can deliver categories 17..30.  decode_coeff
    stays DEFINED there (uint16 extra promotes to int, shifts fit, sign
    is 0 -- coeffs.c:33-48) and read_extra_bits consumes all cat bits
    keeping only the low 16 (huffman.c:294-312); the int32 dequant wrap
    is congruent with our int64 math truncated once.  So our output must
    be BYTE-IDENTICAL to the reference, with no UB event counted."""
    # DC table: 1-bit code 0 -> cat 18, 2-bit code 10 -> cat 0
    counts = [1, 1] + [0] * 14
    # ECS: code(0)=cat18, 18 extra bits (wrap to low 16), then EOB(1010)
    ecs_bits = [0] + [1, 0] * 9 + [1, 0, 1, 0]
    jpg = _gray_stream_with_dc_table(counts, [18, 0], ecs_bits)
    golden = _ref_decode_or_none(jpg)
    assert golden is not None, "reference rejected the cat-18 stream"
    ub0 = default_metrics.counters["serial.reference_ub"]
    ours = jpeg_tpu.decode_jpeg(jpg, entropy="serial").to_pnm()
    assert default_metrics.counters["serial.reference_ub"] == ub0
    assert ours == golden


def test_dc_category_31_plus_counted_not_crashing():
    """cat >= 31 shifts past the int width in decode_coeff -- undefined
    in the reference; we consume the same bits, count the event, and
    keep decoding (the OverflowError crash the fuzz sweep caught)."""
    counts = [1, 1] + [0] * 14
    ecs_bits = [0] + [1, 0] * 20 + [1, 0, 1, 0]
    jpg = _gray_stream_with_dc_table(counts, [40, 0], ecs_bits)
    ub0 = default_metrics.counters["serial.reference_ub"]
    img = jpeg_tpu.decode_jpeg(jpg, entropy="serial")
    assert default_metrics.counters["serial.reference_ub"] > ub0
    assert img.frame.shape[:2] == (8, 8)


def test_ns0_scan_decodes_zero_mcus():
    """An SOS with Ns=0: read_macroblock returns NO_MORE_DATA at once
    (decoder.c:271-273), so the scan processes zero macroblocks and the
    walk continues -- all engines must byte-match the reference (found
    by the fuzz sweep as a lockstep IndexError crash)."""
    jpg = encode_jpeg(make_ppm(16, 16, seed=4), EncodeParams(h=1, v=1))
    i = jpg.find(b"\xff\xda")
    # Ns=0 scan header: len=8 payload Ns=0 Ss=0 Se=63 AhAl=0, no comps
    ns0 = b"\xff\xda\x00\x06\x00\x00\x3f\x00"
    mut = jpg[:i] + ns0 + jpg[i:]
    golden = _ref_decode_or_none(mut)
    assert golden is not None, "reference rejected the Ns=0 scan"
    for eng in ("serial", "lockstep", "lockstep-jax"):
        assert jpeg_tpu.decode_jpeg(mut, entropy=eng).to_pnm() == golden, eng


def test_zero_sampling_factor_counted_and_rejected():
    """H=0 / V=0 components are illegal (T.81 wants 1..4) and put the
    unvalidating reference in undefined territory: SIGFPE when
    max_H/max_V is 0, an infinite read_ecs loop for Ns=1 scans over the
    0-block component, accept-with-NULL-buffers in other layouts.  We
    count the UB event (so harnesses skip parity) and reject cleanly."""
    jpg = encode_jpeg(make_ppm(16, 16, seed=5), EncodeParams(h=2, v=2))
    sof = jpg.find(b"\xff\xc0")
    # components start at sof+2(marker)+2(len)+1(P)+2(Y)+2(X)+1(Nf);
    # each is [Cid, HV, Tq] -- zero the luma H nibble
    hv = sof + 10 + 1
    mut = bytearray(jpg)
    mut[hv] = mut[hv] & 0x0F
    ub0 = default_metrics.counters["serial.reference_ub"]
    with pytest.raises(JpegError):
        jpeg_tpu.decode_jpeg(bytes(mut), entropy="serial")
    assert default_metrics.counters["serial.reference_ub"] > ub0


def test_undefined_table_id_zero_table():
    """A scan whose Td points at a never-defined id <= 3 reads
    UNINITIALIZED hcode memory in the reference -- practically the
    fresh-page zeros of the context malloc, so no code ever matches and
    the scan ends at its first symbol.  Our zero-table analog must
    byte-match; ids > 3 alias out of bounds (htable[2][4]) and are
    counted as reference UB."""
    jpg = encode_jpeg(make_pgm_(16, 16), EncodeParams(h=1, v=1))
    i = jpg.find(b"\xff\xda")
    # rewrite the scan header's Td/Ta byte: Td=3 (undefined), Ta=0
    head = bytearray(jpg[i:i + 10])
    head[6] = 0x30
    mut = jpg[:i] + bytes(head) + jpg[i + 10:]
    golden = _ref_decode_or_none(mut)
    assert golden is not None, "reference rejected the Td=3 stream"
    ub0 = default_metrics.counters["serial.reference_ub"]
    ours = jpeg_tpu.decode_jpeg(mut, entropy="serial").to_pnm()
    assert default_metrics.counters["serial.reference_ub"] == ub0
    assert ours == golden


def make_pgm_(w, h):
    from refbin import make_pgm

    return make_pgm(w, h, seed=6)
