"""Stage-level timing of the device encode path on the real TPU.

Usage: python tools/profile_encode.py [frames] [chunk]
Times (a) full DeviceEncoder.encode_batch, (b) the dense stage alone
(pixels -> differential zig-zag blocks), (c) encode_scan_device2 alone,
(d) host finalize, on the SAME frame content bench.py uses.  Syncs via a
tiny on-device reduction (full device_get would ride the ~25 MB/s dev
tunnel and swamp the numbers).
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

from jpeg_tpu.encoder import EncodeParams
from jpeg_tpu.models import device_encode as de
from jpeg_tpu.entropy.encode_jax import encode_scan_device3

H, W = 1080, 1920
FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 16
CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 16


def make_frame(seed: int) -> np.ndarray:
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
    return np.clip(np.round(img * 255), 0, 255).astype(np.uint8)


@jax.jit
def _sum1(x):
    return jnp.sum(x.astype(jnp.float32).ravel()[:1024])


def sync(x):
    leaves = [a for a in jax.tree_util.tree_leaves(x) if hasattr(a, "shape")]
    vals = [float(_sum1(a)) for a in leaves]
    return vals


def best_of(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print("devices:", jax.devices())
    pixels_h = np.stack([make_frame(s % 16) for s in range(FRAMES)])
    params = EncodeParams(h=2, v=2, optimize=False, exact=False,
                          restart_interval=4)
    enc = de.DeviceEncoder.for_config(H, W, 3, params)
    print(f"n_segments/frame={enc.n_segments} blocks/frame={enc.visit_src.size}")

    pixels = jax.device_put(pixels_h)
    sync(pixels)

    # ---- full path -----------------------------------------------------
    t0 = time.perf_counter()
    out = enc.encode_batch(pixels, chunk=CHUNK)
    print(f"compile+first encode_batch: {time.perf_counter()-t0:.2f}s, "
          f"{sum(map(len, out))/1e6:.1f} MB out "
          f"(items/block={enc.items_per_block}, nz_cap={enc.nz_cap})")
    t = best_of(lambda: enc.encode_batch(pixels, chunk=CHUNK), 4)
    mpix = FRAMES * H * W / 1e6
    print(f"encode_batch: {t*1e3:.1f} ms -> {mpix/t:.1f} Mpix/s")

    # ---- dense-only: pixels -> zz --------------------------------------
    geom = enc.geom
    nseg, wps = enc.n_segments, enc.words_per_seg

    @functools.partial(jax.jit, static_argnames=("frames",))
    def dense_only(pixels, qtables, prev_idx, frames):
        f = pixels.shape[0]
        x = pixels.astype(jnp.float32)
        pad_y = geom.size_y - geom.height
        pad_x = geom.size_x - geom.width
        if pad_y or pad_x:
            x = jnp.pad(x, ((0, 0), (0, pad_y), (0, pad_x), (0, 0)), mode="edge")
        from jpeg_tpu.ops.color import rgb_to_ycc
        from jpeg_tpu.ops.resample import downsample_box
        from jpeg_tpu.models.batch import encode_plane_batch
        from jpeg_tpu.constants import ZIGZAG

        comps = sorted(geom.components, key=lambda c: c.cid)
        ycc = rgb_to_ycc(x, geom.precision, exact=False)
        if pad_y or pad_x:
            in_y = jnp.arange(geom.size_y)[:, None] < geom.height
            in_x = jnp.arange(geom.size_x)[None, :] < geom.width
            ycc = jnp.where((in_y & in_x)[None, :, :, None], ycc, x)
        chans = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        parts = []
        for comp, chan in zip(comps, chans):
            sy = geom.size_y // (comp.b_y * 8)
            sx = geom.size_x // (comp.b_x * 8)
            if sy > 1 or sx > 1:
                chan = downsample_box(chan, sy, sx)
            qt = qtables[0] if comp.tq == 0 else qtables[1]
            parts.append(encode_plane_batch(chan, qt, geom.precision, exact=False))
        allz = jnp.concatenate(parts, axis=1)
        zz = allz[:, :, ZIGZAG]
        dc = zz[:, :, 0]
        prev = jnp.where(
            (prev_idx >= 0)[None, :],
            jnp.take(dc, jnp.clip(prev_idx, 0, None), axis=1), 0,
        )
        return jnp.concatenate([(dc - prev)[:, :, None], zz[:, :, 1:]], axis=2)

    args = (pixels[:CHUNK], jnp.asarray(enc.qtables), jnp.asarray(enc.prev_idx))
    zz = dense_only(*args, frames=CHUNK)
    sync(zz)
    t = best_of(lambda: sync(dense_only(*args, frames=CHUNK)), 5)
    mpix_c = CHUNK * H * W / 1e6
    print(f"dense only ({CHUNK}f): {t*1e3:.1f} ms -> {mpix_c/t:.1f} Mpix/s")

    # ---- entropy-only: zz -> words -------------------------------------
    bf = enc.visit_src.size
    f = CHUNK
    zzf = zz.reshape(f * bf, 64)
    tile = lambda a: jnp.tile(jnp.asarray(a), f)  # noqa: E731
    seg_f = tile(enc.seg_of) + (
        jnp.repeat(jnp.arange(f, dtype=jnp.int32), bf) * nseg
    )
    order_f = tile(enc.visit_src) + (
        jnp.repeat(jnp.arange(f, dtype=jnp.int32), bf) * bf
    )
    print(f"icap={enc.items_per_block}, nz_cap={enc.nz_cap}, "
          f"wpb_cap={enc.wpb_cap}, wps={enc.words_per_seg}")

    def ent(sync_words=False):
        res = encode_scan_device3(
            zzf, tile(enc.dc_tab), tile(enc.ac_tab),
            jnp.asarray(enc.ehufco), jnp.asarray(enc.ehufsi),
            seg_f, f * nseg, wps, enc.items_per_block, order=order_f,
            nz_cap=enc.nz_cap, wpb_cap=enc.wpb_cap, with_hist=False,
        )
        sync(res[:2])
        return res

    r = ent()
    print("overflow:", int(r[2]), "missing:", bool(r[3]))
    t = best_of(ent, 5)
    print(f"entropy only ({CHUNK}f): {t*1e3:.1f} ms -> {mpix_c/t:.1f} Mpix/s")

    # ---- words transfer + host finalize --------------------------------
    seg_bits = np.asarray(r[1])
    w_used = max(1, int((seg_bits.max() + 31) // 32))
    t0 = time.perf_counter()
    words_h = np.asarray(r[0][:, :w_used])
    t_xfer = time.perf_counter() - t0
    print(f"words transfer ({CHUNK}f, {words_h.nbytes/1e6:.1f} MB): "
          f"{t_xfer*1e3:.1f} ms -> {mpix_c/t_xfer:.1f} Mpix/s")
    t = best_of(lambda: enc._finalize(words_h, seg_bits, f), 3)
    print(f"host finalize ({CHUNK}f): {t*1e3:.1f} ms -> {mpix_c/t:.1f} Mpix/s")


if __name__ == "__main__":
    main()
