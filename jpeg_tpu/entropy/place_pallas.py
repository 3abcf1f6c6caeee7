"""Pallas TPU kernel for coefficient PLACEMENT (the decode bottleneck).

The reference places each decoded coefficient serially into its block's
zig-zag slot (coeffs.c:247, block walk decoder.c:339-358).  The XLA
port is one big scatter-SET over the emission stream, measured at the
~6.8 ns/attempt hardware floor of TPU scatter (docs/ARCHITECTURE.md
decode roofline) -- single-element random writes pay a full
read-modify-write of a (8, 128) vector tile each, no matter how the
scatter is expressed, and that one op dominates decode at ~20 ms per
8x1080p chunk.

This kernel beats the floor by exploiting structure XLA's scatter
cannot: emission keys are LANE-LOCAL (each restart-segment lane counts
its MCUs from 0), so a lane's whole destination region is a tiny dense
span of ri x blocks_per_mcu blocks (6 KB for the 4:2:0 ri=4 bench
shape).  A grid cell keeps a 128-lane tile's regions resident in VMEM
([128, RB*64] int32) and applies each emission as a masked one-hot
select over the region row -- pure VPU work at ~RB*64/1024 cycles per
attempt (~1.6 ns for RB=24, ~4x under the scatter floor), zero HBM
read-modify-writes.  Two further structural wins ride along:

  * the step loop runs to a PER-TILE bound fed from the scan's own
    per-lane consumed-step counters (exact, no learned schedule, no
    lane sorting, no starvation risk) -- content is spatially smooth,
    so natural-order tiles are cost-homogeneous and attempts track the
    true symbol count the way VERDICT r2 item 1 asks;
  * the lane-major region output converts to plane-major block order
    with STATIC reshape/transposes (geometry is MCU-divisible and the
    kernel is only eligible when segments tile MCU rows evenly), which
    XLA fuses into the dense stage's first read.

Emissions stream in as [S, steps] (transposed once in XLA); the inner
loop fetches ``MACRO`` (128) columns per macro-step so the dynamic
minor-axis slice amortizes and stays provably 128-aligned for Mosaic.
Slots are write-once (the scan engine's single-stream invariant), so
select order never matters.

Eligibility (``placement_eligible``): interleaved single-scan frames
whose restart interval divides both the MCU count and the MCU row
width, bpm <= 16, region <= 64 blocks.  Everything else stays on the
scatter path.  The kernel compiles only on TPU; CPU tests run it in
interpret mode.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lockstep import ScanPlan

TILE = 128  # lanes per grid cell (region tile: [TILE, RB*64] int32)
# Emission columns fetched per inner-loop iteration.  128 because newer
# Mosaic lowerings require dynamic minor-axis slice offsets provably
# 128-aligned (vector.load of a [TILE, MACRO] tile); the per-tile step
# bound therefore rounds up to 128, which costs <6% extra selects at
# the bench shape and nothing at all once tiles are step-homogeneous.
MACRO = 128
RB_MAX = 64  # region blocks cap (VMEM: 64*64*4*TILE = 2 MB/tile)


def placement_eligible(plan: ScanPlan, ri: int, segs_per_frame: int) -> bool:
    """True when the lane-region kernel + static reorder apply.

    Non-interleaved (Ns=1) scans walk their single plane's blocks in
    raster order (decoder.c:319-335), so a lane's region is already
    plane-contiguous and only even lane tiling is required; interleaved
    scans additionally need segments to tile MCU rows evenly so the
    reorder stays a static reshape/transpose.
    """
    if ri <= 0:
        return False
    bpm = plan.blocks_per_mcu
    if bpm > 16 or ri * bpm > RB_MAX:
        return False
    if plan.n_mcus % ri:
        return False
    if plan.interleaved and plan.m_x % ri:
        return False
    return segs_per_frame * ri == plan.n_mcus


def _region_kernel(bpm: int, rbw: int, steps: int):
    def kernel(ts_ref, emk_ref, emv_ref, out_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, rbw), 1)
        tile_steps = ts_ref[pl.program_id(0)]
        # Accumulate IN PLACE in the output ref.  A functional fori_loop
        # carrying the [TILE, rbw] region through a 128-deep unrolled
        # select chain makes Mosaic stack ~23 live copies of the region
        # (17.9 MB scoped-VMEM OOM at the bench shape, rbw=1536); the
        # ref store keeps exactly one region buffer live.
        out_ref[:] = jnp.zeros((TILE, rbw), jnp.int32)

        def body(m, carry):
            base = pl.multiple_of(m * MACRO, MACRO)
            kb = emk_ref[:, pl.ds(base, MACRO)]
            vb = emv_ref[:, pl.ds(base, MACRO)]
            for j in range(MACRO):
                k = kb[:, j : j + 1]
                v = vb[:, j : j + 1]
                kk = k - 1
                flat = ((kk >> 10) * bpm + ((kk >> 6) & 15)) * 64 + (kk & 63)
                out_ref[:] = jnp.where((iota == flat) & (k > 0), v,
                                       out_ref[:])
            return carry

        # (not pl.cdiv: under jax_enable_x64 its literal promotes to i64)
        n_macro = (tile_steps + jnp.int32(MACRO - 1)) // jnp.int32(MACRO)
        jax.lax.fori_loop(0, n_macro, body, jnp.int32(0))

    return kernel


@partial(jax.jit, static_argnames=("bpm", "rb", "interpret"))
def _place_region(em_key, em_val, nsteps, bpm: int, rb: int,
                  interpret: bool = False):
    """[steps, S] emission stream -> [S, rb*64] lane-major regions.

    ``nsteps`` [S] is the scan's per-lane consumed-step counter; each
    128-lane tile's loop bound is its max, so attempts track the true
    symbol count without any learned schedule.
    """
    steps, s = em_key.shape
    rbp = rb + (rb & 1)  # region minor axis must tile to 128 lanes
    rbw = rbp * 64
    pad = (-s) % TILE
    spad = (-steps) % 128  # minor-axis tiling + macro-fetch slack
    # The whole placement is int32; trace it with x64 OFF.  The package
    # enables jax_enable_x64 globally, and under x64 the BlockSpec index
    # maps trace to i64-returning MLIR functions that Mosaic cannot
    # legalize ("failed to legalize operation 'func.return' (i64)" --
    # this killed BENCH_r03 on real TPU; reproduced with a trivial
    # gridded kernel, fixed by this scope alone).
    with jax.enable_x64(False):
        emk = jnp.pad(em_key.T, ((0, pad), (0, spad)))
        emv = jnp.pad(em_val.T, ((0, pad), (0, spad)))
        steps += spad
        # Whole [n_tiles] vector in SMEM, indexed by program_id: newer
        # Pallas lowerings reject sub-(8, 128) 2-D block shapes even in
        # SMEM, and the per-tile bound is a scalar read either way.
        ts = jnp.pad(nsteps, (0, pad)).reshape(-1, TILE).max(axis=1)
        grid = ((s + pad) // TILE,)
        region = pl.pallas_call(
            _region_kernel(bpm, rbw, steps),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((TILE, steps), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, steps), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, rbw), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((s + pad, rbw), jnp.int32),
            interpret=interpret,
        )(ts.astype(jnp.int32), emk, emv)
    return region[:s, : rb * 64]


def _comp_layout(plan: ScanPlan) -> Tuple[Tuple[int, int, int], ...]:
    """Per-component (slot0, V, H) in scan order (slots are comp-major,
    v-major, h-minor -- build_scan_plan)."""
    out = []
    s = 0
    while s < plan.blocks_per_mcu:
        v = int(plan.slot_V[s])
        h = int(plan.slot_H[s])
        out.append((s, v, h))
        s += v * h
    return tuple(out)


def region_to_coeffs(plan: ScanPlan, region, frames: int,
                     segs_per_frame: int, ri: int):
    """Lane-major regions -> plane-major [frames*total_blocks, 64].

    Pure static reshape/transpose per component: a lane covers ``ri``
    consecutive MCUs of one MCU row (eligibility guarantees rows divide
    evenly), so component blocks land at (my*V + v, (gx*ri + r)*H + h).
    Matches the scatter path's slot_plane_offset layout exactly.
    """
    bpm = plan.blocks_per_mcu
    if not plan.interleaved:
        # Ns=1: region blocks ARE the plane's blocks in raster order.
        return region.reshape(-1, 64)
    m_x = plan.m_x
    m_y = plan.n_mcus // m_x
    gx = m_x // ri
    r = region.reshape(frames, segs_per_frame, ri, bpm, 64)
    parts = []
    for s0, v, h in _comp_layout(plan):
        c = r[:, :, :, s0 : s0 + v * h, :]
        c = c.reshape(frames, m_y, gx, ri, v, h, 64)
        c = c.transpose(0, 1, 4, 2, 3, 5, 6)
        parts.append(c.reshape(frames, m_y * v * m_x * h, 64))
    out = jnp.concatenate(parts, axis=1)
    return out.reshape(-1, 64)


def place_emissions_region(plan: ScanPlan, em_key, em_val, nsteps,
                           frames: int, segs_per_frame: int, ri: int,
                           interpret: bool = False):
    """Drop-in for _place_emissions on eligible shapes (classic scan
    stream): Pallas lane-region placement + static plane reorder."""
    region = _place_region(
        em_key, em_val, nsteps, plan.blocks_per_mcu,
        ri * plan.blocks_per_mcu, interpret=interpret,
    )
    return region_to_coeffs(plan, region, frames, segs_per_frame, ri)
