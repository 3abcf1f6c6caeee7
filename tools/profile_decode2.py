"""Amortized decode stage timing: N async dispatches, one sync.

The dev tunnel adds ~5-15 ms RTT per blocking sync, so per-call timing
lies; queueing N calls and syncing once isolates device time.
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax

try:  # persistent compile cache: repeat runs skip the big XLA compiles
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass
import jax.numpy as jnp
import numpy as np

from jpeg_tpu.models.device_decode import DeviceDecoder
from jpeg_tpu.entropy.lockstep_jax import _place_emissions, _scan_lanes
from tools.profile_decode import make_frame_ppm, H, W, UNIQUE, RI
from jpeg_tpu.encoder import EncodeParams, encode_jpeg

CHUNK = 8
N = 8


def main():
    params = EncodeParams(h=2, v=2, quality=75, optimize=False,
                          restart_interval=RI, exact=False)
    unique = [encode_jpeg(make_frame_ppm(s), params) for s in range(UNIQUE)]
    jpegs = [unique[i % UNIQUE] for i in range(64)]
    dec = DeviceDecoder.for_stream(jpegs[0])
    out = dec.decode_batch(jpegs, chunk=CHUNK)
    out.block_until_ready()
    t0 = time.perf_counter()
    out = dec.decode_batch(jpegs, chunk=CHUNK)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"decode_batch 64f: {dt*1e3:.0f} ms -> {64*H*W/1e6/dt:.1f} Mpix/s")

    prepared = dec.prepare(jpegs[:CHUNK])
    kind, buf, starts, nbits, qts = prepared
    if kind == "flat":
        idx = starts[:, None] + np.arange(dec.wn, dtype=np.int32)[None, :]
        words = np.asarray(buf)[np.minimum(idx, np.asarray(buf).shape[0] - 1)]
    else:  # "mat"/"mats": buf already IS the [S, wn] lane matrix
        words = np.asarray(buf)
    steps = dec.max_steps
    S = words.shape[0]
    total_blocks = sum(c.n_blocks for c in dec.geom.components)
    plan = dec.plan
    jw, jn = jnp.asarray(words), jnp.asarray(nbits.astype(np.int32))
    mpix_c = CHUNK * H * W / 1e6
    print(f"lanes={S} steps={steps} wn={dec.wn} "
          f"mean_sym={nbits.sum()/S/6:.0f}")

    @functools.partial(jax.jit, static_argnames=("max_steps",))
    def scan_only(words, nbits, max_steps):
        counts, (ek, ev), starved, _ = _scan_lanes(plan, words, nbits, max_steps)
        return counts.sum() + ek.sum() + ev.sum()

    @functools.partial(jax.jit, static_argnames=("max_steps",))
    def scan_place(words, nbits, max_steps):
        counts, streams, starved, _ = _scan_lanes(plan, words, nbits, max_steps)
        coeffs = _place_emissions(
            plan, counts, [streams], CHUNK, S // CHUNK, total_blocks
        )
        return coeffs.ravel()[:8].sum()

    for name, fn in (("scan", scan_only), ("scan+place", scan_place)):
        r = fn(jw, jn, steps)
        r.block_until_ready()
        t0 = time.perf_counter()
        rs = [fn(jw, jn, steps) for _ in range(N)]
        rs[-1].block_until_ready()
        dt = (time.perf_counter() - t0) / N
        print(f"{name} ({CHUNK}f): {dt*1e3:.1f} ms -> {mpix_c/dt:.1f} Mpix/s")

    # step-count sensitivity: same lanes, half/double the steps
    for st in (128, 256, 512):
        r = scan_only(jw, jn, st)
        r.block_until_ready()
        t0 = time.perf_counter()
        rs = [scan_only(jw, jn, st) for _ in range(N)]
        rs[-1].block_until_ready()
        dt = (time.perf_counter() - t0) / N
        print(f"scan steps={st}: {dt*1e3:.1f} ms ({dt/st*1e6:.1f} us/step)")


if __name__ == "__main__":
    main()
