"""Stage-level timing of the device encode path on the real TPU.

Usage: python tools/profile_encode.py [frames] [chunk]
Times (a) full DeviceEncoder.encode_batch, (b) the dense stage alone
(pixels -> differential zig-zag blocks), (c) encode_scan_device2 alone,
to locate the bottleneck.  Best-of-N within one process (the shared box
jitters; see CLAUDE.md).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from jpeg_tpu.encoder import EncodeParams
from jpeg_tpu.models import device_encode as de
from jpeg_tpu.entropy.encode_jax import encode_scan_device2

H, W = 1080, 1920
FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 16
CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 16


def sync(x):
    jax.tree_util.tree_map(
        lambda a: np.asarray(jax.device_get(a)).ravel()[:1].sum(), x
    )


def best_of(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, size=(4, H, W, 3), dtype=np.uint8)
    pixels_h = np.concatenate([base] * (FRAMES // 4 + 1))[:FRAMES]
    params = EncodeParams(h=2, v=2, optimize=False, exact=False,
                          restart_interval=8)
    enc = de.DeviceEncoder.for_config(H, W, 3, params)
    print(f"n_segments/frame={enc.n_segments} blocks/frame={enc.visit_src.size}")

    pixels = jax.device_put(pixels_h)
    sync(pixels)

    # ---- full path -----------------------------------------------------
    t0 = time.perf_counter()
    out = enc.encode_batch(pixels, chunk=CHUNK)
    print(f"compile+first encode_batch: {time.perf_counter()-t0:.2f}s, "
          f"{sum(map(len, out))/1e6:.1f} MB out")
    t = best_of(lambda: enc.encode_batch(pixels, chunk=CHUNK), 4)
    mpix = FRAMES * H * W / 1e6
    print(f"encode_batch: {t*1e3:.1f} ms -> {mpix/t:.1f} Mpix/s")

    # ---- dense-only: pixels -> zz --------------------------------------
    geom, ri = enc.geom, enc.ri
    nseg, wps = enc.n_segments, enc.words_per_seg

    import functools

    @functools.partial(jax.jit, static_argnames=("frames",))
    def dense_only(pixels, qtables, visit_src, prev_idx, frames):
        # replicate _encode_device up to zz (keep in sync manually)
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

    args = (pixels[:CHUNK], jnp.asarray(enc.qtables), jnp.asarray(enc.visit_src),
            jnp.asarray(enc.prev_idx))
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
    nb = bf * f
    raw = nb * enc.items_per_block
    quant = 8192 if raw < 262144 else 65536
    items_cap = min(nb * 68, (raw + quant - 1) // quant * quant)
    print(f"items_cap={items_cap} ({items_cap/nb:.1f}/block), nz_cap={enc.nz_cap}")

    def ent():
        res = encode_scan_device2(
            zzf, tile(enc.dc_tab), tile(enc.ac_tab),
            jnp.asarray(enc.ehufco), jnp.asarray(enc.ehufsi),
            seg_f, f * nseg, wps, items_cap, order=order_f,
            nz_cap=enc.nz_cap, with_hist=False,
        )
        sync(res[:2])
        return res

    r = ent()
    print("overflow:", int(r[2]), "missing:", bool(r[3]))
    t = best_of(ent, 5)
    print(f"entropy only ({CHUNK}f): {t*1e3:.1f} ms -> {mpix_c/t:.1f} Mpix/s")

    # ---- host finalize -------------------------------------------------
    words, seg_bits = np.asarray(r[0]), np.asarray(r[1])
    w_used = max(1, int((seg_bits.max() + 31) // 32))
    t = best_of(lambda: enc._finalize(words[:, :w_used], seg_bits, f), 3)
    print(f"host finalize ({CHUNK}f): {t*1e3:.1f} ms -> {mpix_c/t:.1f} Mpix/s")


if __name__ == "__main__":
    main()
