"""Benchmark: 1080p 4:2:0 JPEG decode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpix/s", "vs_baseline": N}

Pipeline measured end-to-end per frame: host marker parse + ECS unstuff,
lockstep entropy decode on the TPU (restart segments as lanes), jitted
dense decode (dequant/IDCT/upsample/color) on the TPU, uint8 pixels
fetched to host.  Baseline = the reference C decoder binary (single
core, the upstream's only execution mode) on the same file, wall time of
the decode process.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent / "tests"))

WIDTH, HEIGHT = 1920, 1080
FRAMES = 8  # timed decode iterations (distinct JPEG frames, MJPEG-style)
RESTART_INTERVAL = 4  # MCUs per segment -> 2040 lanes at 1080p 4:2:0


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


def time_reference(jpegs: list[bytes]) -> float:
    """Mpix/s of the reference decoder binary; 0.0 if unavailable."""
    try:
        from refbin import ensure_reference_binaries
    except ImportError:
        return 0.0
    build = ensure_reference_binaries()
    if build is None:
        return 0.0
    total_s = 0.0
    with tempfile.TemporaryDirectory() as td:
        for i, jpg in enumerate(jpegs):
            inp = Path(td) / f"in{i}.jpg"
            out = Path(td) / f"out{i}.ppm"
            inp.write_bytes(jpg)
            t0 = time.perf_counter()
            res = subprocess.run(
                [str(build / "decoder"), str(inp), str(out)],
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
            total_s += time.perf_counter() - t0
            if res.returncode != 0:
                return 0.0
    return len(jpegs) * WIDTH * HEIGHT / total_s / 1e6


def main() -> None:
    import jpeg_tpu  # noqa: F401  (enables x64; platform stays default = TPU)
    from jpeg_tpu.encoder import EncodeParams, encode_jpeg

    print(f"devices: {__import__('jax').devices()}", file=sys.stderr)

    params = EncodeParams(
        h=2, v=2, quality=75, optimize=True,
        restart_interval=RESTART_INTERVAL, exact=False,  # f32 path on TPU
    )
    jpegs = [encode_jpeg(make_frame_ppm(s), params) for s in range(FRAMES)]
    print(
        f"encoded {FRAMES} frames, {sum(map(len, jpegs))/1e6:.1f} MB total",
        file=sys.stderr,
    )

    def decode_once(jpg: bytes) -> np.ndarray:
        img = jpeg_tpu.decode_jpeg(jpg, exact=False, entropy="auto")
        return img.frame

    # Warmup / compile.
    t0 = time.perf_counter()
    decode_once(jpegs[0])
    print(f"warmup (compile): {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    for jpg in jpegs:
        decode_once(jpg)
    dt = time.perf_counter() - t0
    ours = FRAMES * WIDTH * HEIGHT / dt / 1e6
    print(
        f"ours: {ours:.1f} Mpix/s ({FRAMES} frames in {dt:.2f}s, "
        f"{FRAMES/dt:.1f} fps)",
        file=sys.stderr,
    )

    baseline = time_reference(jpegs)
    print(f"reference: {baseline:.1f} Mpix/s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "decode_1080p_420_Mpix_per_s_per_chip",
                "value": round(ours, 2),
                "unit": "Mpix/s",
                "vs_baseline": round(ours / baseline, 2) if baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
