"""Multi-host orchestration for Motion-JPEG workloads.

The reference has no distributed anything (SURVEY §2.2); the TPU-native
plan is standard JAX multi-controller SPMD:

  * ``initialize()`` wires jax.distributed from environment variables
    (coordinator address / process id / count) -- one controller per
    host, chips per host discovered automatically;
  * frames are the data-parallel unit: ``shard_frames`` assigns each
    process a contiguous slice of a frame list (host-side input
    pipeline), ``global_frame_batch`` builds a process-spanning global
    array from per-host device batches via
    ``jax.make_array_from_single_device_arrays`` so downstream pjit'ed
    consumers (training / inference steps) see one logical [F, H, W, C]
    batch laid out over the whole pod slice.

Scaling model: per-frame decode is embarrassingly parallel; collectives
only appear inside a frame (tile-axis resharding, histogram psums), so
they ride ICI within a host's chips -- frames never need DCN traffic.
This matches the >=80% 1->N host scaling target in BASELINE.md: the only
cross-host work is input distribution.

Single-process fallbacks keep every entry point usable (and testable)
without a pod.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize jax.distributed (no-op for a single process).

    Resolution order: explicit args, then JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars, then single-process.
    Returns (process_id, num_processes).
    """
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    n = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    pid = (
        process_id
        if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "-1") or -1)
    )
    if addr and n > 1 and pid >= 0:
        jax.distributed.initialize(
            coordinator_address=addr, num_processes=n, process_id=pid
        )
        return pid, n
    return 0, 1


def shard_frames(
    frames: Sequence[bytes], process_id: int, num_processes: int
) -> List[bytes]:
    """This process's contiguous slice of the global frame list."""
    per = -(-len(frames) // num_processes)
    return list(frames[process_id * per : (process_id + 1) * per])


def global_frame_batch(local_batch, mesh_axis: str = "frame"):
    """Assemble a process-spanning global array from per-host batches.

    ``local_batch`` is this process's device array [F_local, H, W, C]
    (e.g. a DeviceDecoder output).  The result is a global jax.Array of
    shape [F_local * num_processes, H, W, C] sharded over all addressable
    + non-addressable devices along the frame axis, ready for pjit'ed
    consumers.  Single-process: returns local_batch unchanged.
    """
    if jax.process_count() == 1:
        return local_batch
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices()).reshape(jax.process_count(), -1)
    mesh = Mesh(devs, axis_names=(mesh_axis, "chip"))
    global_shape = (
        local_batch.shape[0] * jax.process_count(),
    ) + tuple(local_batch.shape[1:])
    sharding = NamedSharding(mesh, P(mesh_axis))
    # Per-host shards: the local batch lives on this host's first chip.
    return jax.make_array_from_single_device_arrays(
        global_shape,
        sharding,
        [local_batch],
    )
