"""Benchmark: Motion-JPEG 1080p 4:2:0 decode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpix/s", "vs_baseline": N, ...}

Primary metric: sustained stream decode to DEVICE-resident uint8 frames
-- the TPU-ingestion deployment shape (compressed bytes go up the wire,
entropy + dense decode run on the chip, pixels stay in HBM for
downstream models).  A 64-frame stream is decoded in pipelined chunks;
host prep (native scan/unstuff/pack) and uploads overlap device decode.

Jitter defense (the shared box drifts 3-10x in phases): every timed
section repeats ADAPTIVELY -- at least MIN_REPS, then keeps going until
STABLE consecutive reps land within TOL of the running best (evidence
the box is in a fast phase and the best has converged), up to MAX_REPS.
Best-of is reported.  Back-to-back runs should agree within ~5%.

Secondary numbers (stderr + extra JSON keys): device-resident decode
rate (uploads excluded -- what a PCIe-attached host would see), device
encode with default and optimized (two-pass K.2) tables, and the
speculative RST-less stream decode rate.

Baseline: the reference C decoder (single core, its only mode) on the
same frames, measured BEFORE the TPU runtime starts so its busy-wait
threads don't starve the baseline.
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
CHUNK = 8  # frames per pipelined chunk inside decode_batch

# Adaptive repeat policy (see module docstring).
MIN_REPS = 6
MAX_REPS = 18
STABLE = 3
TOL = 0.04

log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731


def stable_best(fn, mpix: float, label: str,
                min_reps: int = MIN_REPS, max_reps: int = MAX_REPS,
                stable: int = STABLE, tol: float = TOL) -> float:
    """Best-of Mpix/s with adaptive reps.  ``fn()`` runs one full timed
    unit and blocks until the result is ready; ``mpix`` is the Mpix it
    covers.  Stops once `stable` consecutive reps fail to beat the best
    by more than `tol` AND sit within `tol` of it (fast-phase evidence),
    or at max_reps."""
    best, near = 0.0, 0
    for rep in range(max_reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        r = mpix / dt
        if r > best * (1 + tol):
            best, near = max(best, r), 0
        else:
            best = max(best, r)
            near = near + 1 if r >= best * (1 - tol) else 0
        log(f"  {label}: rep {rep + 1} {dt:.3f}s -> {r:.1f} Mpix/s"
            f" (best {best:.1f}, stable {near}/{stable})")
        if rep + 1 >= min_reps and near >= stable:
            break
    return best


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
    with tempfile.TemporaryDirectory() as td:
        paths = []
        for i, jpg in enumerate(jpegs):
            p = Path(td) / f"in{i}.jpg"
            p.write_bytes(jpg)
            paths.append(p)

        def one():
            for p in paths:
                res = subprocess.run(
                    [str(build / "decoder"), str(p), str(Path(td) / "out.ppm")],
                    stdout=subprocess.DEVNULL,
                    stderr=subprocess.DEVNULL,
                )
                if res.returncode != 0:
                    raise RuntimeError("reference decoder failed")

        try:
            mpix = len(jpegs) * WIDTH * HEIGHT / 1e6
            return stable_best(one, mpix, "reference", min_reps=4, max_reps=8)
        except RuntimeError:
            return 0.0


def main() -> None:
    # Hang guard: the remote TPU tunnel can go down for hours on this
    # box, and a bench that blocks forever in backend init is worse
    # than one that fails loudly.  The alarm covers corpus encode +
    # reference baseline + TPU init + first compile, and is cancelled
    # once the first real device work completes.
    import signal

    def _hang(signum, frame):
        log("bench: TPU backend unreachable (init/first-compile exceeded "
            "the hang guard); no measurement possible")
        raise SystemExit(3)

    try:
        signal.signal(signal.SIGALRM, _hang)
        signal.alarm(int(__import__("os").environ.get(
            "JPEG_TPU_BENCH_GUARD_S", "900")))
    except (ValueError, OSError):
        pass  # non-main thread or unsupported platform: no guard

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
    log(f"reference baseline: {baseline:.1f} Mpix/s (single core)")

    extra = {}

    # ---- device batch decode (the headline) ---------------------------
    log(f"devices: {jax.devices()}")
    from jpeg_tpu.models.device_decode import DeviceDecoder

    dec = DeviceDecoder.for_stream(jpegs[0])
    t0 = time.perf_counter()
    out = dec.decode_batch(jpegs, chunk=CHUNK)
    out.block_until_ready()
    try:
        signal.alarm(0)  # device reachable and compiling: guard off
    except (ValueError, OSError):
        pass
    log(f"warmup (compile): {time.perf_counter()-t0:.1f}s; out {out.shape} {out.dtype}")

    def one_stream():
        dec.decode_batch(jpegs, chunk=CHUNK).block_until_ready()

    best = stable_best(one_stream, FRAMES * WIDTH * HEIGHT / 1e6, "stream decode")
    log(f"stream decode best: {best:.1f} Mpix/s")

    # ---- device-resident decode rate (uploads excluded) ---------------
    # The dev tunnel here moves ~25 MB/s, which pins the end-to-end
    # number at (stream bytes / 25 MB/s); re-decoding device-resident
    # words shows what a PCIe-attached host would sustain.  Amortized:
    # 8 async dispatches per timed unit, one sync.
    try:
        prepared = dec.prepare(jpegs[:CHUNK])
        kind, data, starts, nbits, qts = prepared
        # Pin the prepared chunk on device, then re-dispatch through the
        # decoder's own path selection (scatter / phased / Pallas region
        # placement) so this probe always measures the production route.
        dd = jax.device_put(np.asarray(data))
        starts_d = (
            jax.device_put(np.asarray(starts)) if starts is not None else None
        )
        prepared_dev = (kind, dd, starts_d, nbits, qts)
        log(f"device-resident probe: kind={kind} place_ri={dec.place_ri}")
        fn = lambda: dec._decode_prepared(prepared_dev, CHUNK)[0]  # noqa: E731
        jax.block_until_ready(fn())

        def one_resident():
            rs = [fn() for _ in range(8)]
            jax.block_until_ready(rs[-1])

        dr = stable_best(
            one_resident, 8 * CHUNK * WIDTH * HEIGHT / 1e6,
            "device-resident", min_reps=4, max_reps=12,
        )
        log(f"device-resident decode ({kind}; words already in HBM): "
            f"{dr:.1f} Mpix/s")
        extra["device_resident_decode_Mpix_s"] = round(dr, 1)
    except Exception as e:  # diagnostic only; never fail the bench
        log(f"device-resident probe skipped: {type(e).__name__}: {e}")

    # ---- speculative RST-less stream decode ---------------------------
    # Streams WITHOUT restart markers: the reference reads them strictly
    # serially (decoder.c:364-388); the speculative chunked engine is the
    # TPU answer.  Same content, restart_interval=0.
    try:
        from jpeg_tpu import mjpeg

        params_rl = EncodeParams(h=2, v=2, quality=75, optimize=False,
                                 restart_interval=0, exact=False)
        n_rl = 8
        rl_unique = [encode_jpeg(make_frame_ppm(s), params_rl)
                     for s in range(min(UNIQUE, n_rl))]
        rl_stream = b"".join(rl_unique[s % len(rl_unique)] for s in range(n_rl))
        px = mjpeg.decode_stream_device(rl_stream)
        jax.block_until_ready(px)

        def one_rl():
            jax.block_until_ready(mjpeg.decode_stream_device(rl_stream))

        sp = stable_best(one_rl, n_rl * WIDTH * HEIGHT / 1e6,
                         "rstless decode", min_reps=2, max_reps=6)
        log(f"speculative RST-less stream decode: {sp:.1f} Mpix/s "
            f"(reference decodes these serially at ~{baseline:.0f})")
        extra["rstless_stream_decode_Mpix_s"] = round(sp, 1)
    except Exception as e:
        log(f"RST-less probe skipped: {type(e).__name__}: {e}")

    # ---- device-side encode (pixels in HBM -> JPEG bytes) -------------
    import jpeg_tpu
    from jpeg_tpu.utils.pnm import read_pnm

    pix = np.stack([read_pnm(make_frame_ppm(s)).data for s in range(UNIQUE)])
    dpix = jax.device_put(pix.astype(np.uint8))
    try:
        enc = jpeg_tpu.DeviceEncoder.for_config(HEIGHT, WIDTH, 3, params)
        enc.encode_batch(dpix)  # warm/compile
        be = stable_best(lambda: enc.encode_batch(dpix),
                         UNIQUE * WIDTH * HEIGHT / 1e6, "device encode",
                         min_reps=4, max_reps=12)
        log(f"device encode (HBM pixels -> JPEG): {be:.1f} Mpix/s")
        extra["device_encode_Mpix_s"] = round(be, 1)

        # Device COMPUTE alone (dense + entropy + compaction, words stay
        # in HBM): end-to-end encode on this box is bound by pulling the
        # JPEG payload itself through the ~25 MB/s dev tunnel (see the
        # encode roofline, docs/ARCHITECTURE.md); this is the number a
        # PCIe-attached host sees.
        def enc_compute():
            rs = [enc._dispatch(dpix[lo:lo + 8], 8, enc.ehufco,
                                enc.ehufsi, False)
                  for lo in range(0, UNIQUE, 8)]
            jax.block_until_ready([r[0] for r in rs])

        bc = stable_best(enc_compute, UNIQUE * WIDTH * HEIGHT / 1e6,
                         "device encode compute", min_reps=4, max_reps=12)
        log(f"device encode compute (words stay in HBM): {bc:.1f} Mpix/s")
        extra["device_encode_compute_Mpix_s"] = round(bc, 1)
    except Exception as e:
        log(f"device encode probe skipped: {type(e).__name__}: {e}")

    # Two-pass optimized-table path (on-device histogram psum + K.2 +
    # second pass) -- the flagship optimize=True pipeline.
    try:
        enc.encode_batch(dpix, optimize=True)  # warm/compile
        bo = stable_best(lambda: enc.encode_batch(dpix, optimize=True),
                         UNIQUE * WIDTH * HEIGHT / 1e6, "encode optimize=True",
                         min_reps=3, max_reps=8)
        log(f"device encode optimize=True (two-pass K.2): {bo:.1f} Mpix/s")
        extra["device_encode_optimized_Mpix_s"] = round(bo, 1)
    except Exception as e:
        log(f"optimized encode probe skipped: {type(e).__name__}: {e}")

    # ---- decode to host (tunnel-bound in this environment) ------------
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
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
