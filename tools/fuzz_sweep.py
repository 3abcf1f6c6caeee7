"""Long-running differential fuzz sweep against the reference binaries.

Extends tests/test_fuzz_parity.py's fixed corpus to a randomized sweep
over the whole config space (subsampling x precision x quality x restart
x optimize x odd sizes) and mutation set, for as long as a time budget
allows.  Per iteration:

  1. encode a random image with the exact host encoder; when the
     reference encoder accepts the same config with ri=0, the streams
     must be byte-identical (encoder.c semantics);
  2. the stream must decode bit-exactly (PNM bytes) vs the reference
     decoder binary through a randomly drawn entropy engine;
  3. random corruptions of the stream: the serial engine must match the
     reference's accept/reject decision byte-for-byte (accept -> equal
     PNM, reject -> JpegError), any other engine must at worst raise
     JpegError (parallel engines may deviate on INVALID input only --
     the PARITY.md contract).

Failures are saved as repro files under /tmp/fuzz_fail_* and summarized
at the end; exit code 1 when any were found.

Usage: python tools/fuzz_sweep.py [--minutes 30] [--seed 0]
"""

from __future__ import annotations

import argparse
import contextlib
import signal
import subprocess
import sys
import tempfile
import time
import traceback
from pathlib import Path

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np

import jax

# sitecustomize force-selects the remote accelerator via jax.config (env
# vars alone don't stick); fuzzing is host work -- pin the CPU backend
# before any jax computation or a dead tunnel hangs the sweep.
jax.config.update("jax_platforms", "cpu")

import jpeg_tpu
from jpeg_tpu import native
from jpeg_tpu.encoder import EncodeParams, encode_jpeg
from jpeg_tpu.errors import JpegError
from jpeg_tpu.utils.metrics import default_metrics
from refbin import (
    ReferenceEncodeFailed,
    ensure_reference_binaries,
    make_pgm,
    make_ppm,
    ref_decode,
    ref_encode,
)

MODES = [("gray", 1, 1), ("444", 1, 1), ("422", 2, 1), ("420", 2, 2)]


TIMEOUT = object()  # sentinel: the reference ran past the budget


def ref_decode_or_none(build, jpeg_bytes: bytes):
    with tempfile.TemporaryDirectory() as td:
        inp = Path(td) / "in.jpg"
        out = Path(td) / "out.pnm"
        inp.write_bytes(jpeg_bytes)
        try:
            res = subprocess.run(
                [str(build / "decoder"), str(inp), str(out)],
                capture_output=True,
                timeout=60,
            )
        except subprocess.TimeoutExpired:
            # e.g. a bit flip in SOF dims makes the image gigapixels:
            # legitimately minutes of (serial) work, not a hang we can
            # classify.  No parity statement possible.
            return TIMEOUT
        if res.returncode != 0 or not out.exists():
            return None
        return out.read_bytes()


@contextlib.contextmanager
def alarm(seconds: int):
    """SIGALRM-based timeout for our own in-process decode."""
    def handler(signum, frame):
        raise TimeoutError()
    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def mutations(rng, jpg: bytes, k: int):
    n = len(jpg)
    muts = []
    for _ in range(k):
        kind = rng.integers(0, 5)
        if kind == 0:
            muts.append(("trunc", jpg[: int(n * rng.uniform(0.02, 0.999))]))
        elif kind == 1:
            i = int(rng.integers(2, n - 2))
            b = bytearray(jpg)
            b[i] ^= int(rng.integers(1, 256))
            muts.append((f"flip@{i}", bytes(b)))
        elif kind == 2:
            i = int(rng.integers(2, n - 2))
            junk = rng.integers(0, 256, int(rng.integers(1, 9))).astype(
                np.uint8).tobytes()
            muts.append((f"insert@{i}", jpg[:i] + junk + jpg[i:]))
        elif kind == 3:
            i = int(rng.integers(2, n - 4))
            j = i + int(rng.integers(1, 5))
            muts.append((f"delete@{i}", jpg[:i] + jpg[j:]))
        else:
            rst = jpg.find(bytes([0xFF, 0xD0 + int(rng.integers(0, 8))]))
            if rst >= 0:
                muts.append(("dup-rst", jpg[:rst] + jpg[rst:rst + 2] + jpg[rst:]))
            else:
                muts.append(("tail-junk", jpg + b"\x00\xde\xad\xbe\xef"))
    return muts


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=30.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    build = ensure_reference_binaries()
    if build is None:
        print("reference toolchain unavailable", file=sys.stderr)
        return 2

    engines = ["serial"] * 8 + ["lockstep"] * 5 + ["lockstep-jax"] * 1 + [
        "speculative"] * 1 + (["native"] * 4 if native.available() else [])
    rng = np.random.default_rng(args.seed)
    deadline = time.time() + args.minutes * 60
    iters = enc_ident = dec_exact = mut_total = mut_agree = 0
    ub_skipped = slow_skipped = 0
    failures = []

    def fail(tag, detail, blobs):
        nonlocal failures
        i = len(failures)
        stem = Path(f"/tmp/fuzz_fail_{i}")
        for suffix, blob in blobs.items():
            Path(str(stem) + suffix).write_bytes(blob)
        failures.append((tag, detail))
        print(f"FAIL[{i}] {tag}: {detail} (repro {stem}*)", file=sys.stderr,
              flush=True)

    while time.time() < deadline:
        iters += 1
        mode, h, v = MODES[int(rng.integers(0, len(MODES)))]
        maxval = 4095 if rng.random() < 0.2 else 255
        q = int(rng.integers(5, 99))
        optimize = bool(rng.integers(0, 2))
        ri = int(rng.choice([0, 0, 0, 1, 2, 3, 5]))
        w = int(rng.integers(8, 121))
        hh = int(rng.integers(8, 121))
        seed = int(rng.integers(0, 10000))
        cfg = (f"{mode} {w}x{hh} q{q} ri{ri} opt{int(optimize)} "
               f"max{maxval} seed{seed}")
        pnm = (make_pgm if mode == "gray" else make_ppm)(
            w, hh, seed=seed, maxval=maxval)
        params = EncodeParams(h=h, v=v, quality=q, optimize=optimize,
                              restart_interval=ri)
        try:
            ours = encode_jpeg(pnm, params)
        except jpeg_tpu.UnsupportedError:
            # 12-bit content beyond default-table categories: the
            # reference hard-fails there too (value_to_vlc); parity is
            # "both refuse", checked by the conformance matrix.
            continue
        except Exception:
            fail("encode-crash", f"{cfg}\n{traceback.format_exc()}",
                 {".pnm": pnm})
            continue

        if ri == 0:
            # byte-identity vs the reference encoder (it has no DRI flag)
            try:
                theirs = ref_encode(pnm, h=h, v=v, q=q,
                                    optimize=int(optimize))
                enc_ident += 1
                if ours != theirs:
                    fail("encode-differs", cfg,
                         {".pnm": pnm, ".ours.jpg": ours,
                          ".theirs.jpg": theirs})
                    continue
            except ReferenceEncodeFailed:
                pass  # our encoder may exceed the reference (12-bit opt)

        golden = ref_decode_or_none(build, ours)
        if golden is TIMEOUT:
            slow_skipped += 1
            continue
        if golden is None:
            fail("ref-rejects-our-stream", cfg, {".pnm": pnm, ".jpg": ours})
            continue
        engine = engines[int(rng.integers(0, len(engines)))]
        try:
            got = jpeg_tpu.decode_jpeg(ours, exact=True,
                                       entropy=engine).to_pnm()
        except Exception:
            fail(f"decode-crash[{engine}]",
                 f"{cfg}\n{traceback.format_exc()}",
                 {".pnm": pnm, ".jpg": ours})
            continue
        if got != golden:
            fail(f"decode-differs[{engine}]", cfg,
                 {".pnm": pnm, ".jpg": ours, ".golden.pnm": golden,
                  ".got.pnm": got})
            continue
        dec_exact += 1

        for name, mut in mutations(rng, ours, 3):
            mut_total += 1
            g = ref_decode_or_none(build, mut)
            if g is TIMEOUT:
                # gigantic-dims class; our serial Python walk would be
                # slower still -- skip without decoding.
                slow_skipped += 1
                continue
            ub0 = default_metrics.counters["serial.reference_ub"]
            try:
                with alarm(180):
                    m_ours = jpeg_tpu.decode_jpeg(
                        mut, entropy="serial").to_pnm()
            except JpegError:
                m_ours = None
            except TimeoutError:
                # The reference finished under 60 s but our Python-level
                # serial walk did not -- a speed gap, not a parity bug
                # (large-dims accepts); skip.
                slow_skipped += 1
                continue
            except Exception:
                fail(f"serial-crash[{name}]",
                     f"{cfg}\n{traceback.format_exc()}", {".jpg": mut})
                continue
            if default_metrics.counters["serial.reference_ub"] > ub0:
                # The stream drives the reference out of bounds
                # (coeffs.c:247 with an AC run past 63): its output is
                # layout-dependent and it often aborts with heap
                # corruption.  No byte/accept parity is defined there
                # (PARITY.md); crash-freedom on our side is the whole
                # check.
                ub_skipped += 1
                continue
            if g is not None and m_ours != g:
                fail(f"serial-differs[{name}]", cfg,
                     {".jpg": mut, ".parent.jpg": ours, ".golden.pnm": g,
                      ".got.pnm": m_ours or b""})
                continue
            if g is None and m_ours is not None:
                fail(f"serial-accepts[{name}]",
                     f"{cfg} (reference rejects)",
                     {".jpg": mut, ".parent.jpg": ours})
                continue
            mut_agree += 1
            if engine != "serial":
                try:
                    jpeg_tpu.decode_jpeg(mut, entropy=engine)
                except JpegError:
                    pass
                except Exception:
                    fail(f"mut-crash[{engine}][{name}]",
                         f"{cfg}\n{traceback.format_exc()}", {".jpg": mut})

        if iters % 5 == 0:
            print(f"[{time.strftime('%H:%M:%S')}] {iters} configs, "
                  f"{enc_ident} byte-identical encodes, {dec_exact} exact "
                  f"decodes, {mut_agree}/{mut_total} mutation-parity, "
                  f"{len(failures)} failures", file=sys.stderr, flush=True)

    print(f"done: {iters} configs, {enc_ident} byte-identical encodes, "
          f"{dec_exact} exact decodes, {mut_agree}/{mut_total} "
          f"mutation-parity, {ub_skipped} ub-skipped, "
          f"{slow_skipped} slow-skipped, {len(failures)} failures",
          file=sys.stderr, flush=True)
    for tag, detail in failures:
        print(f"  {tag}: {detail}", file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
