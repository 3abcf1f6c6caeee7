"""Helpers to run the reference binaries as the executable spec."""

from __future__ import annotations

import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
REF_BUILD = Path(os.environ.get("REF_BUILD_DIR", "/tmp/jpeg_ref_build"))


def ensure_reference_binaries() -> Path | None:
    """Build the reference decoder/encoder; None if impossible."""
    dec, enc = REF_BUILD / "decoder", REF_BUILD / "encoder"
    if dec.exists() and enc.exists():
        return REF_BUILD
    script = REPO / "tools" / "build_reference.sh"
    try:
        subprocess.run(
            ["sh", str(script)],
            check=True,
            capture_output=True,
            env={**os.environ, "REF_BUILD_DIR": str(REF_BUILD)},
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return REF_BUILD if dec.exists() else None


def ref_decode(jpeg_bytes: bytes) -> bytes:
    """Run the reference decoder; returns the output PNM bytes."""
    build = ensure_reference_binaries()
    assert build is not None, "reference binaries unavailable"
    with tempfile.TemporaryDirectory() as td:
        inp = Path(td) / "in.jpg"
        out = Path(td) / "out.pnm"
        inp.write_bytes(jpeg_bytes)
        res = subprocess.run(
            [str(build / "decoder"), str(inp), str(out)],
            capture_output=True,
        )
        assert res.returncode == 0, res.stdout.decode() + res.stderr.decode()
        return out.read_bytes()


class ReferenceEncodeFailed(Exception):
    """The reference encoder reported Failure / aborted / truncated output.

    Note its main() returns 0 even on internal failure (encoder.c:714-723
    prints "Failure." then returns 0), so success is detected by a
    complete EOI-terminated output, not the exit code.
    """


def ref_encode(
    pnm_bytes: bytes, h: int = 2, v: int = 1, q: int = 75, optimize: int = 1
) -> bytes:
    """Run the reference encoder; returns the JPEG bytes."""
    build = ensure_reference_binaries()
    assert build is not None, "reference binaries unavailable"
    with tempfile.TemporaryDirectory() as td:
        inp = Path(td) / "in.pnm"
        out = Path(td) / "out.jpg"
        inp.write_bytes(pnm_bytes)
        res = subprocess.run(
            [
                str(build / "encoder"),
                # int() so a bool doesn't become "True" (atoi -> 0)
                "-h", str(int(h)), "-v", str(int(v)), "-q", str(int(q)),
                "-o", str(int(optimize)),
                str(inp), str(out),
            ],
            capture_output=True,
        )
        data = out.read_bytes() if out.exists() else b""
        failed = (
            res.returncode != 0
            or b"Failure" in res.stderr
            or not data.endswith(b"\xff\xd9")
        )
        if failed:
            raise ReferenceEncodeFailed(
                f"rc={res.returncode} stderr={res.stderr[-200:]!r} "
                f"len={len(data)}"
            )
        return data


def make_ppm(width: int, height: int, seed: int = 0, maxval: int = 255) -> bytes:
    """Deterministic synthetic P6 image: smooth gradients + texture."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float64)
    r = 0.5 + 0.5 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
    g = (xx + yy) / (width + height)
    b = 0.5 + 0.5 * np.cos(xx / 31.0 + yy / 13.0)
    img = np.stack([r, g, b], axis=-1)
    img = img + rng.normal(0, 0.02, img.shape)
    samples = np.clip(np.round(img * maxval), 0, maxval)
    header = b"P6\n%d %d\n%d\n" % (width, height, maxval)
    if maxval <= 255:
        return header + samples.astype(np.uint8).tobytes()
    return header + samples.astype(">u2").tobytes()


def make_pgm(width: int, height: int, seed: int = 0, maxval: int = 255) -> bytes:
    """Deterministic synthetic P5 image."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float64)
    img = 0.5 + 0.4 * np.sin(xx / 11.0) * np.cos(yy / 7.0)
    img = img + rng.normal(0, 0.03, img.shape)
    samples = np.clip(np.round(img * maxval), 0, maxval)
    header = b"P5\n%d %d\n%d\n" % (width, height, maxval)
    if maxval <= 255:
        return header + samples.astype(np.uint8).tobytes()
    return header + samples.astype(">u2").tobytes()
