"""Stage-level timing of the device stream-decode path on the real TPU.

Usage: python tools/profile_decode.py [frames] [chunk]
Times (a) full decode_batch, (b) host prep alone, (c) the entropy scan
alone, (d) entropy scan + placement, (e) the dense stage alone -- to
locate where the next decode Mpix/s lives (VERDICT r1 item 3).
"""

from __future__ import annotations

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

from jpeg_tpu.encoder import EncodeParams, encode_jpeg
from jpeg_tpu.models.device_decode import DeviceDecoder, _decode_impl
from jpeg_tpu.entropy.lockstep_jax import (
    _max_steps_for, _place_emissions, _scan_lanes,
)

H, W = 1080, 1920
FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 64
CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 8
UNIQUE = 16
RI = 4


def make_frame_ppm(seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.stack(
        [
            0.5 + 0.5 * np.sin(xx / 37.0 + seed) * np.cos(yy / 23.0),
            (xx + yy) / (W + H),
            0.5 + 0.5 * np.cos(xx / 61.0 - yy / 41.0),
        ],
        axis=-1,
    )
    img += rng.normal(0, 0.02, img.shape).astype(np.float32)
    samples = np.clip(np.round(img * 255), 0, 255).astype(np.uint8)
    return b"P6\n%d %d\n255\n" % (W, H) + samples.tobytes()


@jax.jit
def _sum1(x):
    return jnp.sum(x.astype(jnp.float32).ravel()[:1024])


def sync(x):
    for a in jax.tree_util.tree_leaves(x):
        if hasattr(a, "shape"):
            float(_sum1(a))


def best_of(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print("devices:", jax.devices())
    params = EncodeParams(h=2, v=2, quality=75, optimize=False,
                          restart_interval=RI, exact=False)
    unique = [encode_jpeg(make_frame_ppm(s), params) for s in range(UNIQUE)]
    jpegs = [unique[i % UNIQUE] for i in range(FRAMES)]
    print(f"{FRAMES} frames, {sum(map(len, jpegs))/1e6:.1f} MB stream")

    dec = DeviceDecoder.for_stream(jpegs[0])
    out = dec.decode_batch(jpegs, chunk=CHUNK)
    out.block_until_ready()
    mpix = FRAMES * H * W / 1e6
    t = best_of(lambda: dec.decode_batch(jpegs, chunk=CHUNK).block_until_ready(), 4)
    print(f"decode_batch: {t*1e3:.1f} ms -> {mpix/t:.1f} Mpix/s "
          f"(max_steps={dec.max_steps})")

    # host prep alone
    t = best_of(lambda: dec.prepare(jpegs[:CHUNK]), 5)
    mpix_c = CHUNK * H * W / 1e6
    print(f"host prep ({CHUNK}f): {t*1e3:.1f} ms -> {mpix_c/t:.1f} Mpix/s")

    # materialize one chunk's lane matrix
    prepared = dec.prepare(jpegs[:CHUNK])
    assert prepared[0] == "flat"
    buf, starts, nbits, qts = prepared[1:]
    idx = starts[:, None] + np.arange(dec.wn, dtype=np.int32)[None, :]
    words = np.asarray(buf)[np.minimum(idx, np.asarray(buf).shape[0] - 1)]
    nb64 = nbits.astype(np.int64) // 8 * 8
    steps = max(dec.max_steps, _max_steps_for(nbits.astype(np.int64) // 8,
                                              dec.plan, dec.ri))
    steps = dec.max_steps
    S = words.shape[0]
    total_blocks = sum(c.n_blocks for c in dec.geom.components)
    print(f"lanes={S} steps={steps} wn={dec.wn}")

    jw, jn = jnp.asarray(words), jnp.asarray(nbits.astype(np.int32))
    plan = dec.plan

    import functools

    @functools.partial(jax.jit, static_argnames=("max_steps",))
    def scan_only(words, nbits, max_steps):
        counts, (ek, ev), starved, _ = _scan_lanes(plan, words, nbits, max_steps)
        return counts, ek.sum(), ev.sum(), starved

    r = scan_only(jw, jn, steps)
    sync(r[:3])
    t = best_of(lambda: sync(scan_only(jw, jn, steps)[:3]), 5)
    print(f"entropy scan only ({CHUNK}f): {t*1e3:.1f} ms -> {mpix_c/t:.1f} Mpix/s")

    @functools.partial(jax.jit, static_argnames=("max_steps",))
    def scan_place(words, nbits, max_steps):
        counts, streams, starved, _ = _scan_lanes(plan, words, nbits, max_steps)
        coeffs = _place_emissions(
            plan, counts, [streams], CHUNK, S // CHUNK, total_blocks
        )
        return coeffs, starved

    r2 = scan_place(jw, jn, steps)
    sync(r2[0])
    t = best_of(lambda: sync(scan_place(jw, jn, steps)[0]), 5)
    print(f"scan+placement ({CHUNK}f): {t*1e3:.1f} ms -> {mpix_c/t:.1f} Mpix/s")

    # dense-only: reuse coefficients
    coeffs = r2[0]

    @jax.jit
    def dense_only(coeffs, qtables):
        from jpeg_tpu.models.batch import decode_blocks_batch
        from jpeg_tpu.ops.color import to_rgb
        from jpeg_tpu.ops.resample import upsample_nn
        from jpeg_tpu.utils.floatops import roundf

        geom = dec.geom
        c3 = coeffs.reshape(CHUNK, total_blocks, 64)
        chans = []
        off = 0
        for comp in geom.components:
            n = comp.n_blocks
            plane = decode_blocks_batch(
                c3[:, off : off + n], qtables[comp.tq], comp.b_y, comp.b_x,
                geom.precision, exact=False,
            )
            off += n
            chans.append(upsample_nn(
                plane, geom.size_y // (comp.b_y * 8),
                geom.size_x // (comp.b_x * 8)))
        frame = jnp.stack(chans, axis=-1)
        rgb = to_rgb(frame, geom.precision, exact=False)
        px = jnp.clip(roundf(rgb), 0, 255).astype(jnp.uint8)
        return px[:, : geom.height, : geom.width, :3]

    jq = jnp.asarray(qts)
    r3 = dense_only(coeffs, jq)
    sync(r3)
    t = best_of(lambda: sync(dense_only(coeffs, jq)), 5)
    print(f"dense only ({CHUNK}f): {t*1e3:.1f} ms -> {mpix_c/t:.1f} Mpix/s")


if __name__ == "__main__":
    main()
