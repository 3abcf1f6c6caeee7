"""Sustained stream-decode roofline: where the end-to-end 64-frame path
spends its time (VERDICT r4 item 3: headline 232 vs device-resident 784
Mpix/s -- ~45 ms/chunk of host prep / upload / dispatch unexplained).

Decomposes one sustained `decode_batch` run into measured rows:
  * host prep per chunk (native rows-mode pack, per-frame C++ calls)
  * upload bytes + achieved host->device rate
  * dispatch wall (async submit cost incl. jnp.asarray transfers)
  * pure device compute (prepared chunk resident in HBM, amortized)
  * the full pipelined decode_batch wall for the same 64 frames

Reuses the bench corpus cache (bench.py --make-corpus) so repeat runs
start instantly.  Usage: python tools/profile_sustained.py [CHUNK]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

os.environ.setdefault("JPEG_TPU_PROFILE", "1")

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass
import jax.numpy as jnp
import numpy as np

import tempfile

W, H = 1920, 1080
FRAMES = 64
UNIQUE = 16
RI = 4
CHUNK = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def corpus() -> list:
    cache = Path(tempfile.gettempdir()) / "jpeg_tpu_bench_corpus_v1"
    names = [f"ri{RI}_{s}.jpg" for s in range(UNIQUE)]
    if not all((cache / n).is_file() for n in names):
        subprocess.run(
            [sys.executable, "bench.py", "--make-corpus", str(cache)],
            check=True,
        )
    uniq = [(cache / n).read_bytes() for n in names]
    return [uniq[s % UNIQUE] for s in range(FRAMES)]


def best_of(fn, reps: int = 5) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from jpeg_tpu.models.device_decode import DeviceDecoder
    from jpeg_tpu.utils.metrics import default_metrics

    jpegs = corpus()
    mpix = FRAMES * W * H / 1e6
    print(f"stream: {FRAMES} frames, {sum(map(len, jpegs))/1e6:.1f} MB, "
          f"{mpix:.0f} Mpix, chunk={CHUNK}")
    dec = DeviceDecoder.for_stream(jpegs[0])
    print(f"decoder: place_ri={dec.place_ri} prep_mode={dec.prep_mode} "
          f"wn={dec.wn} spf={dec.segs_per_frame}")

    t0 = time.perf_counter()
    dec.decode_batch(jpegs, chunk=CHUNK).block_until_ready()
    print(f"warmup: {time.perf_counter()-t0:.1f}s")

    # ---- full sustained runs, with the built-in stage traces ----------
    default_metrics.stages.clear()
    best = best_of(
        lambda: dec.decode_batch(jpegs, chunk=CHUNK).block_until_ready(),
        reps=5,
    )
    n_chunks = (FRAMES + CHUNK - 1) // CHUNK
    print(f"\nfull decode_batch: best {best*1e3:.1f} ms "
          f"({mpix/best:.1f} Mpix/s)")
    prep = default_metrics.stages.get("device_decode.prepare")
    disp = default_metrics.stages.get("device_decode.dispatch")
    if prep:
        print(f"  host prep:  {prep.total_s/prep.calls*1e3:.2f} ms/chunk "
              f"({prep.calls} calls)")
    if disp:
        print(f"  dispatch:   {disp.total_s/disp.calls*1e3:.2f} ms/chunk "
              f"(incl. jnp.asarray upload submit)")

    # ---- prep alone (host-side, serial) --------------------------------
    chunks = [jpegs[i:i + CHUNK] for i in range(0, FRAMES, CHUNK)]
    t_prep = best_of(lambda: [dec.prepare(c) for c in chunks], reps=3)
    prepared = [dec.prepare(c) for c in chunks]
    kind = prepared[0][0]
    up_bytes = sum(p[1].nbytes for p in prepared)
    print(f"\nprep only ({kind}): {t_prep*1e3:.1f} ms total, "
          f"{t_prep/n_chunks*1e3:.2f} ms/chunk")

    # ---- upload alone ---------------------------------------------------
    def upload():
        ds = [jax.device_put(p[1]) for p in prepared]
        jax.block_until_ready(ds)
        return ds

    t_up = best_of(upload, reps=3)
    print(f"upload only: {up_bytes/1e6:.1f} MB in {t_up*1e3:.1f} ms "
          f"-> {up_bytes/t_up/1e6:.0f} MB/s "
          f"({t_up/n_chunks*1e3:.2f} ms/chunk)")

    # ---- dispatch + device compute with data already resident ----------
    res = []
    for p in prepared:
        kind, data, starts, nbits, qts = p
        dd_ = jax.device_put(np.asarray(data))
        st = jax.device_put(np.asarray(starts)) if starts is not None else None
        res.append((kind, dd_, st, nbits, qts))
    jax.block_until_ready([r[1] for r in res])

    def submit_all():
        outs = [dec._decode_prepared(r, CHUNK)[0] for r in res]
        return outs

    # submit wall (async; host-side dispatch cost incl. RTTs)
    t_sub = best_of(lambda: submit_all(), reps=3)
    # device wall (same submits, one sync)
    def device_all():
        outs = submit_all()
        jax.block_until_ready(outs[-1])

    t_dev = best_of(device_all, reps=5)
    print(f"dispatch submit (resident data, async): {t_sub*1e3:.1f} ms "
          f"({t_sub/n_chunks*1e3:.2f} ms/chunk)")
    print(f"device compute (resident data, synced): {t_dev*1e3:.1f} ms "
          f"({mpix/t_dev:.1f} Mpix/s)")

    print("\nroofline rows (per 64-frame stream):")
    rows = [
        ("host prep", t_prep),
        ("upload", t_up),
        ("dispatch submit", t_sub),
        ("device compute", t_dev),
    ]
    for name, t in rows:
        print(f"  {name:18s} {t*1e3:8.1f} ms  "
              f"({t/n_chunks*1e3:6.2f} ms/chunk)")
    print(f"  {'serial sum':18s} {sum(t for _, t in rows)*1e3:8.1f} ms  "
          f"vs measured {best*1e3:.1f} ms "
          f"(pipelining hides {max(0, sum(t for _, t in rows)-best)*1e3:.1f})")


if __name__ == "__main__":
    main()
