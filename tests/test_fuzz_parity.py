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
from refbin import ensure_reference_binaries, make_ppm

pytestmark = pytest.mark.skipif(
    ensure_reference_binaries() is None, reason="reference toolchain unavailable"
)


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
        try:
            ours = jpeg_tpu.decode_jpeg(mut, entropy="serial").to_pnm()
        except JpegError:
            ours = None
        except Exception as e:  # noqa: BLE001 - anything else is a bug
            raise AssertionError(f"{name}: non-JpegError {type(e).__name__}: {e}")
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
