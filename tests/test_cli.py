"""CLI coverage: every entropy backend flag, encode backends, and the
-v diagnostics (qtable dump, COM text, MCU counts, trailing garbage --
decoder.c:60-65, 403-431, 604-609; common.c:174)."""

from __future__ import annotations

import numpy as np
import pytest

from jpeg_tpu import cli
from jpeg_tpu.encoder import EncodeParams, encode_jpeg

from refbin import ensure_reference_binaries, make_ppm, ref_decode

pytestmark = pytest.mark.skipif(
    ensure_reference_binaries() is None, reason="reference toolchain unavailable"
)


@pytest.fixture(scope="module")
def sample(tmp_path_factory):
    td = tmp_path_factory.mktemp("cli")
    ppm = make_ppm(64, 48, seed=3)
    (td / "in.ppm").write_bytes(ppm)
    jpg = encode_jpeg(ppm, EncodeParams(quality=80, restart_interval=2))
    (td / "in.jpg").write_bytes(jpg)
    return td, ppm, jpg


@pytest.mark.parametrize(
    "backend", ["auto", "serial", "lockstep", "lockstep-jax", "native"]
)
def test_decode_entropy_flags(sample, backend, capsys):
    td, _, jpg = sample
    out = td / f"out_{backend}.ppm"
    rc = cli.main(
        ["decode", "--entropy", backend, str(td / "in.jpg"), str(out)]
    )
    assert rc == 0
    assert out.read_bytes() == ref_decode(jpg)


def test_decode_verbose_diagnostics(sample, capsys, tmp_path):
    td, _, jpg = sample
    # Append trailing garbage + a COM segment to exercise the reports.
    com = b"\xff\xfe" + (2 + 5).to_bytes(2, "big") + b"hello"
    soi, rest = jpg[:2], jpg[2:]
    noisy = soi + com + rest + b"\x00garbage"
    p = tmp_path / "noisy.jpg"
    p.write_bytes(noisy)
    rc = cli.main(["decode", "-v", str(p), str(tmp_path / "o.ppm")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "quantization table 0" in out
    assert "comment: hello" in out
    assert "macroblocks processed" in out
    # every scan decoded fully
    for line in out.splitlines():
        if "macroblocks processed" in line:
            got, want = line.split(":")[1].split(",")
            assert got.strip().split()[0] == want.strip().split()[0]
    assert "garbage after EOI" in out


@pytest.mark.parametrize("backend", ["numpy", "jax", "native"])
def test_encode_backend_flags(sample, backend, tmp_path):
    td, ppm, _ = sample
    out = tmp_path / f"out_{backend}.jpg"
    rc = cli.main(
        ["encode", "--entropy-backend", backend, "-q", "80",
         str(td / "in.ppm"), str(out)]
    )
    assert rc == 0
    # streams must decode on the reference binary
    pnm = ref_decode(out.read_bytes())
    assert pnm[:2] == b"P6"


def test_sanitizer_mode_counts(sample, monkeypatch):
    """JPEG_TPU_CHECKS=1 asserts decoded-MCU counts match geometry."""
    td, _, jpg = sample
    monkeypatch.setenv("JPEG_TPU_CHECKS", "1")
    from jpeg_tpu.api import decode_coefficients, expected_mcus

    cs, _ = decode_coefficients(jpg)
    assert cs.mcus_decoded == [
        expected_mcus(cs.geometry, s.info) for s in cs.scans
    ]


def test_sanitizer_mode_catches_truncation(sample, monkeypatch):
    """A truncated final ECS decodes fewer MCUs -> CorruptStream."""
    td, _, jpg = sample
    monkeypatch.setenv("JPEG_TPU_CHECKS", "1")
    from jpeg_tpu.api import decode_coefficients
    from jpeg_tpu.errors import CorruptStream, JpegError

    # chop 12 bytes before EOI: last segment loses MCUs
    bad = jpg[:-14] + jpg[-2:]
    with pytest.raises(JpegError):
        decode_coefficients(bad, entropy="serial")


def test_encode_reference_getopt_letters(sample, tmp_path):
    """-h/-v are the luma sampling factors exactly like the reference's
    getopt (encoder.c:677-699); output is byte-identical at equal args."""
    from refbin import ref_encode

    td, ppm, _ = sample
    out = tmp_path / "getopt.jpg"
    rc = cli.main(["encode", "-h", "2", "-v", "2", "-q", "80",
                   str(td / "in.ppm"), str(out)])
    assert rc == 0
    assert out.read_bytes() == ref_encode(ppm, h=2, v=2, q=80, optimize=1)
