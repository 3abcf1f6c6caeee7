"""Benchmark: Motion-JPEG 1080p 4:2:0 decode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpix/s", "vs_baseline": N}

Primary metric: sustained stream decode to DEVICE-resident uint8 frames
-- the TPU-ingestion deployment shape (compressed bytes go up the wire,
entropy + dense decode run on the chip, pixels stay in HBM for
downstream models).  A 64-frame stream is decoded in pipelined chunks;
host prep (native scan/unstuff/pack) and uploads overlap device decode.

Baseline: the reference C decoder (single core, its only mode) on the
same frames, measured BEFORE the TPU runtime starts so its busy-wait
threads don't starve the baseline.

A secondary decode-to-host number (native C++ entropy + jitted dense) is
reported on stderr; on this dev environment it is tunnel-bandwidth-bound
(~22 MB/s device->host), not representative of local TPU attach.
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent / "tests"))

WIDTH, HEIGHT = 1920, 1080
FRAMES = 64  # stream length; 16 unique frame contents repeated
UNIQUE = 16
RESTART_INTERVAL = 4  # MCUs per segment -> 2040 lanes/frame at 1080p 4:2:0
REPEATS = 6  # best-of, riding out shared-host/tunnel jitter
CHUNK = 8  # frames per pipelined chunk inside decode_batch


def make_frame_ppm(seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:HEIGHT, 0:WIDTH].astype(np.float32)
    img = np.stack(
        [
            0.5 + 0.5 * np.sin(xx / 37.0 + seed) * np.cos(yy / 23.0),
            (xx + yy) / (WIDTH + HEIGHT),
            0.5 + 0.5 * np.cos(xx / 61.0 - yy / 41.0),
        ],
        axis=-1,
    )
    img += rng.normal(0, 0.02, img.shape).astype(np.float32)
    samples = np.clip(np.round(img * 255), 0, 255).astype(np.uint8)
    return b"P6\n%d %d\n255\n" % (WIDTH, HEIGHT) + samples.tobytes()


def time_reference(jpegs: list) -> float:
    """Mpix/s of the reference decoder binary; 0.0 if unavailable."""
    try:
        from refbin import ensure_reference_binaries
    except ImportError:
        return 0.0
    build = ensure_reference_binaries()
    if build is None:
        return 0.0
    best = 0.0
    with tempfile.TemporaryDirectory() as td:
        paths = []
        for i, jpg in enumerate(jpegs):
            p = Path(td) / f"in{i}.jpg"
            p.write_bytes(jpg)
            paths.append(p)
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            for i, p in enumerate(paths):
                res = subprocess.run(
                    [str(build / "decoder"), str(p), str(Path(td) / "out.ppm")],
                    stdout=subprocess.DEVNULL,
                    stderr=subprocess.DEVNULL,
                )
                if res.returncode != 0:
                    return 0.0
            dt = time.perf_counter() - t0
            best = max(best, len(jpegs) * WIDTH * HEIGHT / dt / 1e6)
    return best


def main() -> None:
    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731

    # ---- encode the corpus on CPU (before the TPU runtime wakes up) ---
    import jax

    # Persistent compile cache: repeat bench runs skip the 20-60 s XLA
    # compiles (first run per machine still pays them).
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    # Encoding setup is host-side work; do it and the reference baseline
    # before any TPU traffic.
    from jpeg_tpu.encoder import EncodeParams, encode_jpeg

    params = EncodeParams(
        h=2, v=2, quality=75, optimize=False,  # shared (MJPEG) tables
        restart_interval=RESTART_INTERVAL, exact=False,
    )
    unique = [encode_jpeg(make_frame_ppm(s), params) for s in range(UNIQUE)]
    jpegs = [unique[s % UNIQUE] for s in range(FRAMES)]
    log(f"encoded {UNIQUE} unique frames -> {FRAMES}-frame stream, "
        f"{sum(map(len, jpegs))/1e6:.1f} MB total")

    # Reference throughput is per-frame; timing the unique frames suffices.
    baseline = time_reference(unique)
    log(f"reference baseline: {baseline:.1f} Mpix/s (single core, best of {REPEATS})")

    # ---- device batch decode ------------------------------------------
    log(f"devices: {jax.devices()}")
    from jpeg_tpu.models.device_decode import DeviceDecoder

    dec = DeviceDecoder.for_stream(jpegs[0])
    t0 = time.perf_counter()
    out = dec.decode_batch(jpegs, chunk=CHUNK)
    out.block_until_ready()
    log(f"warmup (compile): {time.perf_counter()-t0:.1f}s; out {out.shape} {out.dtype}")

    best = 0.0
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = dec.decode_batch(jpegs, chunk=CHUNK)
        out.block_until_ready()
        dt = time.perf_counter() - t0
        best = max(best, FRAMES * WIDTH * HEIGHT / dt / 1e6)
        log(f"stream decode: {FRAMES} frames in {dt:.2f}s -> "
            f"{FRAMES/dt:.1f} fps, {FRAMES*WIDTH*HEIGHT/dt/1e6:.1f} Mpix/s")

    # ---- secondary: device-resident decode rate (uploads excluded) ----
    # The dev tunnel here moves ~25 MB/s, which pins the end-to-end
    # number at (stream bytes / 25 MB/s); re-decoding device-resident
    # words shows what a PCIe-attached host would sustain.
    try:
        import jax.numpy as jnp

        from jpeg_tpu.models.device_decode import _decode_device_flat

        prepared = dec.prepare(jpegs[:CHUNK])
        if prepared[0] == "flat":
            buf, starts, nbits, qts = prepared[1:]
            db = jax.device_put(np.asarray(buf))
            ds = jax.device_put(starts)
            dn = jax.device_put(nbits)
            dq = jax.device_put(qts)
            args = (dec.plan, dec.geom, db, ds, dn, dq, dec.max_steps,
                    CHUNK, dec.segs_per_frame, dec.wn)
            r = _decode_device_flat(*args)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            rs = [_decode_device_flat(*args) for _ in range(8)]
            jax.block_until_ready(rs[-1])
            dt = (time.perf_counter() - t0) / 8
            log(f"device-resident decode (words already in HBM): "
                f"{CHUNK*WIDTH*HEIGHT/1e6/dt:.1f} Mpix/s")
    except Exception as e:  # diagnostic only; never fail the bench
        log(f"device-resident probe skipped: {type(e).__name__}: {e}")

    # ---- secondary: device-side encode (pixels in HBM -> JPEG bytes) ---
    import jpeg_tpu
    from jpeg_tpu.utils.pnm import read_pnm

    pix = np.stack([read_pnm(make_frame_ppm(s)).data for s in range(UNIQUE)])
    enc = jpeg_tpu.DeviceEncoder.for_config(HEIGHT, WIDTH, 3, params)
    dpix = jax.device_put(pix.astype(np.uint8))
    enc.encode_batch(dpix)  # warm/compile
    best_enc = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        enc.encode_batch(dpix)
        dt = time.perf_counter() - t0
        best_enc = max(best_enc, UNIQUE * WIDTH * HEIGHT / dt / 1e6)
    log(f"device encode (HBM pixels -> JPEG): {best_enc:.1f} Mpix/s")

    # ---- secondary: decode to host (tunnel-bound in this environment) -
    jpeg_tpu.decode_jpeg(jpegs[0], exact=False)  # warm
    t0 = time.perf_counter()
    jpeg_tpu.decode_jpeg(jpegs[1], exact=False)
    dt = time.perf_counter() - t0
    log(f"decode-to-host (native entropy + device dense): "
        f"{WIDTH*HEIGHT/dt/1e6:.1f} Mpix/s/frame "
        f"[bounded by this dev host's ~25 MB/s device tunnel; "
        f"PCIe-attached hosts move the same pixels ~100x faster]")

    print(
        json.dumps(
            {
                "metric": "mjpeg_1080p_420_stream_decode_to_device_Mpix_per_s_per_chip",
                "value": round(best, 2),
                "unit": "Mpix/s",
                "vs_baseline": round(best / baseline, 2) if baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
