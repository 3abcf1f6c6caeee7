"""Dense decode stage breakdown (dequant/IDCT -> raster -> upsample ->
color -> u8) on the bench shape.

After the Pallas region placement, the dense pipeline (~11 ms per
8x1080p chunk, round-2 roofline) is decode's largest device stage; this
profiler times cumulative prefixes of `_dense_from_coeffs` so the next
optimization targets the measured term, not a guess.  Amortized timing
(8 async dispatches, one sync) per the box rules.

Usage (healthy TPU): python tools/profile_dense.py
"""

from __future__ import annotations

import sys
import time

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

from jpeg_tpu.encoder import EncodeParams, encode_jpeg
from jpeg_tpu.format.parse import parse_codestream
from jpeg_tpu.models.batch import decode_blocks_batch
from jpeg_tpu.models.device_decode import _dense_from_coeffs
from jpeg_tpu.ops.color import ycc_to_rgb_planar
from jpeg_tpu.ops.resample import upsample_nn
from jpeg_tpu.utils.floatops import roundf
from tools.profile_decode import make_frame_ppm, H, W, RI

CHUNK = 8
N = 8


def timeit(fn, *args):
    jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        rs = [fn(*args) for _ in range(N)]
        jax.block_until_ready(rs[-1])
        best = min(best, (time.perf_counter() - t0) / N)
    return best


def main():
    params = EncodeParams(h=2, v=2, quality=75, optimize=False,
                          restart_interval=RI, exact=False)
    cs = parse_codestream(encode_jpeg(make_frame_ppm(0), params))
    geom = cs.geometry
    qts = jnp.asarray(cs.qtables.astype(np.int32))
    total_blocks = sum(c.n_blocks for c in geom.components)
    rng = np.random.default_rng(0)
    coeffs = jnp.asarray(rng.integers(
        -64, 64, size=(CHUNK, total_blocks, 64)).astype(np.int32))
    mpix = CHUNK * H * W / 1e6

    comps = list(geom.components)
    offs = np.cumsum([0] + [c.n_blocks for c in comps])

    def idct_only(coeffs, qts):
        outs = []
        for i, c in enumerate(comps):
            outs.append(decode_blocks_batch(
                coeffs[:, offs[i]:offs[i + 1]], qts[c.tq], c.b_y, c.b_x,
                geom.precision, exact=False))
        return [o.ravel()[:8].sum() for o in outs]

    def idct_up(coeffs, qts):
        outs = []
        for i, c in enumerate(comps):
            p = decode_blocks_batch(
                coeffs[:, offs[i]:offs[i + 1]], qts[c.tq], c.b_y, c.b_x,
                geom.precision, exact=False)
            p = upsample_nn(p, geom.size_y // (c.b_y * 8),
                            geom.size_x // (c.b_x * 8))
            outs.append(p)
        return [o.ravel()[:8].sum() for o in outs]

    def idct_up_color(coeffs, qts):
        chans = []
        for i, c in enumerate(comps):
            p = decode_blocks_batch(
                coeffs[:, offs[i]:offs[i + 1]], qts[c.tq], c.b_y, c.b_x,
                geom.precision, exact=False)
            chans.append(upsample_nn(p, geom.size_y // (c.b_y * 8),
                                     geom.size_x // (c.b_x * 8)))
        r, g, b = ycc_to_rgb_planar(chans[0], chans[1], chans[2],
                                    geom.precision, exact=False)
        return r.ravel()[:8].sum() + g.ravel()[:8].sum() + b.ravel()[:8].sum()

    def full(coeffs, qts):
        return _dense_from_coeffs(coeffs, geom, qts)

    for tag, fn in (
        ("dequant+IDCT+raster", jax.jit(idct_only)),
        ("  +chroma upsample", jax.jit(idct_up)),
        ("  +planar color", jax.jit(idct_up_color)),
        ("full (+u8 quant/interleave/crop)", jax.jit(full)),
    ):
        dt = timeit(fn, coeffs, qts)
        print(f"{tag:34s} {dt*1e3:7.2f} ms  ({mpix/dt:6.1f} Mpix/s)")


if __name__ == "__main__":
    main()
