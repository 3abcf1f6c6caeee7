"""Per-phase timing of the speculative RST-less decode on one 1080p frame.

Instruments _speculative_core's phases by monkeypatching its device entry
points; identifies whether the bottleneck is the probe scan, the meta
download (rides the ~25 MB/s tunnel), host resolution, the final decode,
or the dense stage.
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
import numpy as np

from jpeg_tpu.encoder import EncodeParams, encode_jpeg
from jpeg_tpu.entropy import speculative as spec
from tools.profile_decode import make_frame_ppm, H, W

T = {}


def timed(name, fn):
    def wrap(*a, **k):
        t0 = time.perf_counter()
        r = fn(*a, **k)
        jax.block_until_ready(r)
        T.setdefault(name, []).append(time.perf_counter() - t0)
        return r

    return wrap


def main():
    params = EncodeParams(h=2, v=2, quality=75, optimize=False,
                          restart_interval=0, exact=False)
    data = encode_jpeg(make_frame_ppm(3), params)
    print(f"frame: {len(data)/1e3:.0f} KB compressed", file=sys.stderr)

    spec._probe_match = timed("probe+match(jit+sync)", spec._probe_match)
    spec._final_decode = timed("final(jit+sync)", spec._final_decode)

    # Wrap np.asarray on meta to catch the download: patch run_probe's
    # download by timing inside _speculative_core is invasive; instead
    # time the whole core and subtract the patched pieces.
    from jpeg_tpu.models.device_decode import (
        decode_frame_rstless,
        decode_stream_rstless,
    )

    for rep in range(3):
        T.clear()
        t0 = time.perf_counter()
        px = decode_frame_rstless(data, lanes=1024)
        np.asarray(px).sum()
        total = time.perf_counter() - t0
        lines = [f"1-frame total {total*1e3:.0f} ms "
                 f"({H*W/1e6/total:.1f} Mpix/s)"]
        acct = 0.0
        for k, v in T.items():
            lines.append(f"  {k}: {len(v)} calls, {sum(v)*1e3:.0f} ms")
            acct += sum(v)
        lines.append(f"  unaccounted (host windows + resolve + dense): "
                     f"{(total-acct)*1e3:.0f} ms")
        print("\n".join(lines), file=sys.stderr)

    # batched: 8 frames, one probe/match + one final
    from jpeg_tpu.utils.metrics import default_metrics

    parts = [data] * 8
    for rep in range(3):
        T.clear()
        default_metrics.stages.clear()
        default_metrics.counters.clear()
        t0 = time.perf_counter()
        px = decode_stream_rstless(parts)
        np.asarray(px[:, :2, :2]).sum()  # sync without the big download
        total = time.perf_counter() - t0
        lines = [f"8-frame batched total {total*1e3:.0f} ms "
                 f"({8*H*W/1e6/total:.1f} Mpix/s)"]
        acct = 0.0
        for k, v in T.items():
            lines.append(f"  {k}: {len(v)} calls, {sum(v)*1e3:.0f} ms")
            acct += sum(v)
        lines.append(f"  unaccounted: {(total-acct)*1e3:.0f} ms")
        lines.append("  -- internal stages --")
        for line in default_metrics.report().splitlines():
            lines.append(f"  {line}")
        print("\n".join(lines), file=sys.stderr)


if __name__ == "__main__":
    main()
