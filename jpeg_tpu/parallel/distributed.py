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

    ``local_batch`` is this process's [F_local, H, W, C] batch (numpy or
    device array; e.g. a DeviceDecoder output).  The result is a global
    jax.Array of shape [F_local * num_processes, H, W, C] sharded over
    the ('frame', 'chip') process mesh -- each host's shard replicated
    over its own chips, so pjit'ed consumers see one logical batch.
    Single-process: returns local_batch unchanged.

    (Round-1 advisor fix: the old form handed ONE single-device shard to
    make_array_from_single_device_arrays, which is wrong whenever a host
    has more than one addressable device;
    ``make_array_from_process_local_data`` places the local data across
    every addressable device the sharding expects.)
    """
    if jax.process_count() == 1:
        return local_batch
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices()).reshape(jax.process_count(), -1)
    mesh = Mesh(devs, axis_names=(mesh_axis, "chip"))
    sharding = NamedSharding(mesh, P(mesh_axis))
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_batch)
    )
