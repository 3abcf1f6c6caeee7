"""Benchmark: Motion-JPEG 1080p 4:2:0 decode throughput on one TPU chip.

Prints ONE JSON line -- ALWAYS, no matter which sections fail or stall:
  {"metric": ..., "value": N, "unit": "Mpix/s", "vs_baseline": N, ...}

Primary metric: sustained stream decode to DEVICE-resident uint8 frames
-- the TPU-ingestion deployment shape (compressed bytes go up the wire,
entropy + dense decode run on the chip, pixels stay in HBM for
downstream models).  A 64-frame stream is decoded in pipelined chunks;
host prep (native scan/unstuff/pack) and uploads overlap device decode.

Termination contract (the BENCH_r04 post-mortem: a surprise mid-timing
XLA recompile burned 900 s and the driver's timeout killed the process
before the JSON line printed):
  * a GLOBAL wall deadline (JPEG_TPU_BENCH_DEADLINE_S, default 840 s)
    is checked before every optional section -- late sections skip;
  * every section runs under a re-armed SIGALRM budget, so no single
    section can eat the rest of the run;
  * the JSON line prints in a ``finally`` with whatever keys completed;
  * a daemon WATCHDOG thread emits the line and exits the process if
    the main thread is stuck inside an uninterruptible C call (an XLA
    compile does not deliver signals until it returns);
  * risky sections run LAST: encode evidence lands before the
    speculative RST-less section can spend its compile budget, and the
    RST-less warmup uses mjpeg.warm_stream_device (learned-statics
    fixed point) so its timed reps never recompile.

Jitter defense (the shared box drifts 3-10x in phases): every timed
section repeats ADAPTIVELY -- at least min_reps, then keeps going until
STABLE consecutive reps land within TOL of the running best, up to
max_reps AND a per-section wall budget.  Best-of is reported.

Baseline: the reference C decoder (single core, its only mode) on the
same frames, measured BEFORE the TPU runtime starts so its busy-wait
threads don't starve the baseline.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import threading
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
STABLE = 3
TOL = 0.04

# Global wall budget; the driver's own timeout must be comfortably above.
DEADLINE_S = float(os.environ.get("JPEG_TPU_BENCH_DEADLINE_S", "840"))
# Watchdog hard-kill: fires only when the main thread is wedged in a C
# call past the deadline (signals can't interrupt an XLA compile).
HARD_KILL_S = float(
    os.environ.get("JPEG_TPU_BENCH_HARD_KILL_S", str(DEADLINE_S + 300))
)

_T0 = time.monotonic()

log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731


def left() -> float:
    """Seconds remaining until the global deadline."""
    return DEADLINE_S - (time.monotonic() - _T0)


# ---- guaranteed single JSON emission --------------------------------
RESULT = {
    "metric": "mjpeg_1080p_420_stream_decode_to_device_Mpix_per_s_per_chip",
    "value": 0.0,
    "unit": "Mpix/s",
    "vs_baseline": None,
}
_EMIT_LOCK = threading.Lock()
_EMITTED = [False]


def emit() -> bool:
    """Print the JSON line exactly once; True if this call printed it."""
    with _EMIT_LOCK:
        if _EMITTED[0]:
            return False
        _EMITTED[0] = True
    print(json.dumps(RESULT), flush=True)
    return True


def _watchdog() -> None:
    end = _T0 + HARD_KILL_S
    while True:
        dt = end - time.monotonic()
        if dt <= 0:
            break
        time.sleep(min(dt, 5.0))
    if emit():
        log(f"bench: watchdog hard-kill at {HARD_KILL_S:.0f}s -- main "
            "thread wedged (XLA compile?); emitted partial result")
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(2)


class SectionTimeout(Exception):
    pass


class section:
    """SIGALRM-armed wall budget for one bench section.

    On expiry -- or ANY exception when the section is optional -- logs
    and suppresses, so later sections and the final JSON still run.
    The alarm re-arms per section (BENCH_r04's guard was disarmed
    forever after the first compile).  An uninterruptible C call delays
    signal delivery until it returns; the watchdog is the backstop.
    """

    def __init__(self, label: str, budget_s: float, required: bool = False):
        self.label = label
        self.budget_s = max(1.0, budget_s)
        self.required = required
        self._old = None

    def __enter__(self):
        def _h(signum, frame):
            raise SectionTimeout(
                f"{self.label}: exceeded {self.budget_s:.0f}s budget"
            )

        try:
            self._old = signal.signal(signal.SIGALRM, _h)
            signal.alarm(int(self.budget_s))
        except (ValueError, OSError):
            self._old = None  # non-main thread / unsupported: no guard
        return self

    def __exit__(self, et, ev, tb):
        try:
            signal.alarm(0)
            if self._old is not None:
                signal.signal(signal.SIGALRM, self._old)
        except (ValueError, OSError):
            pass
        if et is None:
            return False
        if issubclass(et, (SystemExit, KeyboardInterrupt)):
            return False
        log(f"bench: section '{self.label}' skipped: "
            f"{et.__name__}: {ev}")
        RESULT.setdefault("skipped", []).append(self.label)
        return not self.required


def stable_best(fn, mpix: float, label: str,
                min_reps: int = 4, max_reps: int = 12,
                stable: int = STABLE, tol: float = TOL,
                budget_s: float = 60.0) -> float:
    """Best-of Mpix/s with adaptive reps.  ``fn()`` runs one full timed
    unit and blocks until the result is ready; ``mpix`` is the Mpix it
    covers.  Stops once `stable` consecutive reps fail to beat the best
    by more than `tol` AND sit within `tol` of it (fast-phase evidence),
    at max_reps, or when the section's wall budget runs out."""
    best, near = 0.0, 0
    t_start = time.perf_counter()
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
        if time.perf_counter() - t_start > budget_s:
            log(f"  {label}: wall budget {budget_s:.0f}s spent after "
                f"rep {rep + 1}; reporting best so far")
            break
    return best


def retry_transient(fn, label: str, attempts: int = 3):
    """Run ``fn`` retrying TRANSIENT backend failures (the remote-TPU
    compile/dispatch service drops connections under load: INTERNAL
    'response body closed', UNAVAILABLE, DEADLINE_EXCEEDED).  Real
    errors -- shape/type/compile-diagnostic failures -- re-raise
    immediately; they would only recur."""
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            msg = f"{type(e).__name__}: {e}"
            transient = any(
                s in msg
                for s in ("INTERNAL", "UNAVAILABLE", "DEADLINE_EXCEEDED",
                          "remote_compile", "body closed", "Connection",
                          "Socket closed", "RESOURCE_EXHAUSTED")
            )
            if not transient or i == attempts - 1:
                raise
            log(f"  {label}: transient backend error (attempt {i + 1}/"
                f"{attempts}), retrying: {msg[:160]}")
            time.sleep(2.0 * (i + 1))


N_RL = 8  # RST-less stream length (and unique contents)


def _make_corpus(outdir: str) -> None:
    """Subprocess entry: encode both corpora on the CPU backend.

    encode_jpeg's dense stage runs on the default jax backend; on this
    box that is the remote TPU behind a ~25 MB/s tunnel, and pulling 24
    frames' coefficient planes through it blew the corpus budget
    (BENCH r5 run 1).  A CPU-forced subprocess encodes at ~2.7 s/frame
    and the files cache across runs.
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    from jpeg_tpu.encoder import EncodeParams, encode_jpeg

    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    p_ri = EncodeParams(h=2, v=2, quality=75, optimize=False,
                        restart_interval=RESTART_INTERVAL, exact=False)
    p_rl = EncodeParams(h=2, v=2, quality=75, optimize=False,
                        restart_interval=0, exact=False)
    for s in range(UNIQUE):
        (out / f"ri{RESTART_INTERVAL}_{s}.jpg.tmp").write_bytes(
            encode_jpeg(make_frame_ppm(s), p_ri)
        )
    for s in range(N_RL):
        (out / f"rl_{s}.jpg.tmp").write_bytes(
            encode_jpeg(make_frame_ppm(s), p_rl)
        )
    for p in out.glob("*.jpg.tmp"):  # atomic publish
        p.rename(p.with_suffix(""))


def build_corpus():
    """(restart-interval uniques, RST-less uniques), via the disk cache
    or a CPU-forced encoding subprocess."""
    cache = Path(tempfile.gettempdir()) / "jpeg_tpu_bench_corpus_v1"
    names = [f"ri{RESTART_INTERVAL}_{s}.jpg" for s in range(UNIQUE)]
    names += [f"rl_{s}.jpg" for s in range(N_RL)]

    def ready() -> bool:
        return all(
            (cache / n).is_file() and (cache / n).stat().st_size > 10_000
            for n in names
        )

    if not ready():
        log("corpus cache miss: encoding in a CPU subprocess...")
        subprocess.run(
            [sys.executable, __file__, "--make-corpus", str(cache)],
            check=True, timeout=max(30, min(420, left() - 120)),
        )
        if not ready():
            raise RuntimeError("corpus subprocess produced no usable files")
    uniq = [(cache / f"ri{RESTART_INTERVAL}_{s}.jpg").read_bytes()
            for s in range(UNIQUE)]
    rl = [(cache / f"rl_{s}.jpg").read_bytes() for s in range(N_RL)]
    return uniq, rl


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


def time_reference(jpegs: list, budget_s: float) -> float:
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
            return stable_best(one, mpix, "reference", min_reps=3,
                               max_reps=8, budget_s=budget_s)
        except RuntimeError:
            return 0.0


def main() -> None:
    threading.Thread(target=_watchdog, daemon=True).start()
    try:
        _run_sections()
    except KeyboardInterrupt:
        raise
    except BaseException as e:  # noqa: BLE001 -- the line must print
        import traceback

        traceback.print_exc(file=sys.stderr)
        RESULT["error"] = f"{type(e).__name__}: {e}"
    finally:
        emit()


def _run_sections() -> None:
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
    from jpeg_tpu.encoder import EncodeParams

    params = EncodeParams(
        h=2, v=2, quality=75, optimize=False,  # shared (MJPEG) tables
        restart_interval=RESTART_INTERVAL, exact=False,
    )
    with section("corpus-encode", 480, required=True):
        unique, rl_unique = build_corpus()
    jpegs = [unique[s % UNIQUE] for s in range(FRAMES)]
    log(f"encoded {UNIQUE} unique frames -> {FRAMES}-frame stream, "
        f"{sum(map(len, jpegs))/1e6:.1f} MB total")

    # Reference throughput is per-frame; timing the unique frames suffices.
    baseline = 0.0
    with section("reference-baseline", 120):
        baseline = time_reference(unique, budget_s=45)
    log(f"reference baseline: {baseline:.1f} Mpix/s (single core)")
    RESULT["baseline_Mpix_s"] = round(baseline, 1)

    # ---- device batch decode (the headline) ---------------------------
    log(f"devices: {jax.devices()}")
    from jpeg_tpu.models.device_decode import DeviceDecoder

    dec = DeviceDecoder.for_stream(jpegs[0])
    with section("decode-warmup", min(540.0, max(60.0, left() - 120)),
                 required=True):
        # Compile on ONE chunk first: the compile-phase tunnel exposure
        # (uploads while XLA churns) is 1/8 of the full stream's, so a
        # tunnel slowdown during the longest non-timed phase can't eat
        # the whole budget (BENCH_r05 run 1: full-stream warmup at a
        # 30 KB/s tunnel phase blew the 540 s budget).
        t0 = time.perf_counter()
        retry_transient(
            lambda: dec.decode_batch(
                jpegs[:CHUNK], chunk=CHUNK
            ).block_until_ready(),
            "warmup-chunk",
        )
        t1 = time.perf_counter()
        out = retry_transient(
            lambda: dec.decode_batch(jpegs, chunk=CHUNK), "warmup-stream"
        )
        out.block_until_ready()
        log(f"warmup: chunk compile {t1-t0:.1f}s + full stream "
            f"{time.perf_counter()-t1:.1f}s; out {out.shape} {out.dtype}; "
            f"prep_mode={dec.prep_mode}")

    def one_stream():
        dec.decode_batch(jpegs, chunk=CHUNK).block_until_ready()

    with section("stream-decode", max(20.0, min(90.0, left() - 60))):
        best = stable_best(one_stream, FRAMES * WIDTH * HEIGHT / 1e6,
                           "stream decode", min_reps=5, max_reps=18,
                           budget_s=max(15.0, min(75.0, left() - 60)))
        log(f"stream decode best: {best:.1f} Mpix/s")
        RESULT["value"] = round(best, 2)
        RESULT["vs_baseline"] = (
            round(best / baseline, 2) if baseline else None
        )

    # ---- device-resident decode rate (uploads excluded) ---------------
    # The dev tunnel here moves ~25 MB/s, which pins the end-to-end
    # number at (stream bytes / tunnel rate); re-decoding device-resident
    # words shows what a PCIe-attached host would sustain.  Amortized:
    # 8 async dispatches per timed unit, one sync.
    if left() > 90:
        with section("device-resident", max(30.0, left() - 30)):
            # Pin the ROWS-prep route: this metric's premise is lane
            # words already resident in HBM (a PCIe-attached host, where
            # uploads are free and auto prep picks rows); the flat
            # route's rebuild gather belongs to the upload-bound path.
            keep_mode = dec.prep_mode
            dec.prep_mode = "rows"
            try:
                prepared = dec.prepare(jpegs[:CHUNK])
            finally:
                dec.prep_mode = keep_mode
            kind, data, starts, nbits, qts = prepared
            # Pin the prepared chunk on device, then re-dispatch through
            # the decoder's own path selection (scatter / phased /
            # Pallas region placement) so this probe always measures the
            # production route.
            dd = jax.device_put(np.asarray(data))
            starts_d = (
                jax.device_put(np.asarray(starts))
                if starts is not None else None
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
                "device-resident", min_reps=4, max_reps=12, budget_s=40,
            )
            log(f"device-resident decode ({kind}; words already in HBM): "
                f"{dr:.1f} Mpix/s")
            RESULT["device_resident_decode_Mpix_s"] = round(dr, 1)

    # ---- device-side encode (pixels in HBM -> JPEG bytes) -------------
    # Encode runs BEFORE the speculative section: its evidence must not
    # depend on the riskiest section's compile appetite (BENCH_r04 died
    # with no encode numbers at all).
    import jpeg_tpu
    from jpeg_tpu.utils.pnm import read_pnm

    enc = None
    if left() > 120:
        with section("device-encode", max(45.0, left() - 30)):
            pix = np.stack(
                [read_pnm(make_frame_ppm(s)).data for s in range(UNIQUE)]
            )
            dpix = jax.device_put(pix.astype(np.uint8))
            enc = jpeg_tpu.DeviceEncoder.for_config(HEIGHT, WIDTH, 3, params)
            retry_transient(lambda: enc.encode_batch(dpix), "encode-warm")
            be = stable_best(lambda: enc.encode_batch(dpix),
                             UNIQUE * WIDTH * HEIGHT / 1e6, "device encode",
                             min_reps=4, max_reps=12, budget_s=35)
            log(f"device encode (HBM pixels -> JPEG): {be:.1f} Mpix/s")
            RESULT["device_encode_Mpix_s"] = round(be, 1)

    if enc is not None and left() > 80:
        with section("device-encode-compute", max(35.0, left() - 30)):
            # Device COMPUTE alone (dense + entropy + compaction, words
            # stay in HBM): end-to-end encode on this box is bound by
            # pulling the JPEG payload through the ~25 MB/s dev tunnel
            # (encode roofline, docs/ARCHITECTURE.md); this is the
            # number a PCIe-attached host sees.
            def enc_compute():
                rs = [enc._dispatch(dpix[lo:lo + 8], 8, enc.ehufco,
                                    enc.ehufsi, False)
                      for lo in range(0, UNIQUE, 8)]
                jax.block_until_ready([r[0] for r in rs])

            bc = stable_best(enc_compute, UNIQUE * WIDTH * HEIGHT / 1e6,
                             "device encode compute", min_reps=4,
                             max_reps=12, budget_s=35)
            log(f"device encode compute (words stay in HBM): {bc:.1f} Mpix/s")
            RESULT["device_encode_compute_Mpix_s"] = round(bc, 1)

    if enc is not None and left() > 80:
        with section("encode-optimize", max(45.0, left() - 30)):
            # Two-pass optimized-table path (on-device histogram psum +
            # K.2 + second pass) -- the flagship optimize=True pipeline.
            retry_transient(
                lambda: enc.encode_batch(dpix, optimize=True),
                "encode-optimize-warm",
            )
            bo = stable_best(
                lambda: enc.encode_batch(dpix, optimize=True),
                UNIQUE * WIDTH * HEIGHT / 1e6, "encode optimize=True",
                min_reps=3, max_reps=8, budget_s=35)
            log(f"device encode optimize=True (two-pass K.2): {bo:.1f} Mpix/s")
            RESULT["device_encode_optimized_Mpix_s"] = round(bo, 1)

    # ---- speculative RST-less stream decode ---------------------------
    # Streams WITHOUT restart markers: the reference reads them strictly
    # serially (decoder.c:364-388); the speculative chunked engine is the
    # TPU answer.  Runs LAST (fresh learned statics can compile for
    # minutes) and warms to the learned-state fixed point so the timed
    # reps never recompile.
    if left() > 120:
        with section("rstless-decode", max(60.0, left() - 20)):
            from jpeg_tpu import mjpeg

            n_rl = N_RL
            rl_stream = b"".join(
                rl_unique[s % len(rl_unique)] for s in range(n_rl)
            )
            t0 = time.perf_counter()
            retry_transient(
                lambda: mjpeg.warm_stream_device(
                    rl_stream, budget_s=max(30.0, left() - 60)
                ),
                "rstless-warm",
            )
            log(f"rstless warm (to learned fixed point): "
                f"{time.perf_counter()-t0:.1f}s")

            def one_rl():
                jax.block_until_ready(mjpeg.decode_stream_device(rl_stream))

            sp = stable_best(one_rl, n_rl * WIDTH * HEIGHT / 1e6,
                             "rstless decode", min_reps=2, max_reps=6,
                             budget_s=max(20.0, min(40.0, left() - 15)))
            log(f"speculative RST-less stream decode: {sp:.1f} Mpix/s "
                f"(reference decodes these serially at ~{baseline:.0f})")
            RESULT["rstless_stream_decode_Mpix_s"] = round(sp, 1)

    # ---- decode to host (tunnel-bound in this environment) ------------
    if left() > 40:
        with section("decode-to-host", 35):
            jpeg_tpu.decode_jpeg(jpegs[0], exact=False)  # warm
            t0 = time.perf_counter()
            jpeg_tpu.decode_jpeg(jpegs[1], exact=False)
            dt = time.perf_counter() - t0
            log(f"decode-to-host (native entropy + device dense): "
                f"{WIDTH*HEIGHT/dt/1e6:.1f} Mpix/s/frame "
                f"[bounded by this dev host's ~25 MB/s device tunnel; "
                f"PCIe-attached hosts move the same pixels ~100x faster]")

    log(f"bench complete with {left():.0f}s of deadline to spare")


if __name__ == "__main__":
    if sys.argv[1:2] == ["--make-corpus"]:
        _make_corpus(sys.argv[2])
    else:
        main()
