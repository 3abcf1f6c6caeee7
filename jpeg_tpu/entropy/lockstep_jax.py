"""JAX/TPU lockstep entropy decoder.

The accelerator port of ``lockstep.py``: identical per-step math, but the
lockstep loop is a ``lax.while_loop`` of jitted vector ops, so Huffman
decoding itself runs ON the device and its output (a
``[total_blocks, 64]`` int32 coefficient tensor) feeds the dense pipeline
with no host round trip.  Segments are lanes; dead lanes no-op; the loop
exits as soon as every lane drains.

TPU mapping notes:
  * all per-step state is [S]-shaped int32 in vector registers;
  * the 48-bit window load is 6 gathered bytes combined in uint64;
  * canonical decode = 16 parallel compares against per-length maxcode
    (VPU-friendly, no 64K LUT gather);
  * emissions record (local_mcu, slot, pos, value) in preallocated
    [max_steps, S] buffers; global placement happens after the loop:
    an exclusive prefix-sum of per-lane MCU counts (the "ring-attention"
    trick of SURVEY §2.2) plus one vectorized block-index computation and
    a scatter with mode='drop' for dead/out-of-range emissions.

Correctness is pinned by cross-validation against the NumPy lockstep
engine and the serial oracle (tests/test_lockstep_jax.py).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import ZIGZAG
from ..geometry import FrameGeometry, ScanInfo
from ..tables import HuffTable
from .lockstep import ScanPlan, _pad_segments, build_scan_plan


from functools import lru_cache

from ..tables import derive_table


@lru_cache(maxsize=256)
def _cached_plan(geom, info, spec_items) -> ScanPlan:
    """Plans are static jit arguments: cache them so identical geometry +
    table sets reuse one compiled executable."""
    tables = {k: derive_table(spec) for k, spec in spec_items}
    return build_scan_plan(geom, info, tables)


def _plan_consts(plan: ScanPlan):
    c = lambda a: jnp.asarray(a, dtype=jnp.int32)  # noqa: E731
    return dict(
        slot_comp=c(plan.slot_comp),
        slot_v=c(plan.slot_v),
        slot_h=c(plan.slot_h),
        slot_V=c(plan.slot_V),
        slot_H=c(plan.slot_H),
        slot_bx=c(plan.slot_bx),
        slot_nblocks=c(plan.slot_nblocks),
        slot_plane_offset=c(plan.slot_plane_offset),
        slot_dc_tab=c(plan.slot_dc_tab),
        slot_ac_tab=c(plan.slot_ac_tab),
        mincode=c(plan.mincode),
        maxcode=c(plan.maxcode),
        valptr=c(plan.valptr),
        huffval=c(plan.huffval),
        zigzag=c(ZIGZAG),
    )


def _block_index(plan: ScanPlan, k, gmcu, slot):
    """Global block index of (mcu, slot); pure arithmetic, any shape."""
    if plan.interleaved:
        my = gmcu // plan.m_x
        mx = gmcu % plan.m_x
        seq = (my * k["slot_V"][slot] + k["slot_v"][slot]) * k["slot_bx"][slot] + (
            mx * k["slot_H"][slot] + k["slot_h"][slot]
        )
    else:
        seq = gmcu * plan.blocks_per_mcu + k["slot_h"][slot]
    ok = seq < k["slot_nblocks"][slot]
    return k["slot_plane_offset"][slot] + seq, ok


@partial(jax.jit, static_argnames=("plan", "max_steps", "total_blocks"))
def decode_scan_device(
    plan: ScanPlan,
    bytes_mat: jnp.ndarray,  # [S, L+8] uint8
    nbits: jnp.ndarray,  # [S] int32
    max_steps: int,
    total_blocks: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full on-device scan decode -> (counts[S], coeffs[total_blocks, 64])."""
    k = _plan_consts(plan)
    S = bytes_mat.shape[0]
    bpm = plan.blocks_per_mcu
    offs6 = jnp.arange(6, dtype=jnp.int32)
    shift6 = jnp.uint64(40) - jnp.uint64(8) * jnp.arange(6, dtype=jnp.uint64)
    lane_iota = jnp.arange(S)

    def step(state):
        (n, bitpos, alive, mcu, slot, coeff, dc_pred, cur_diff, bufs) = state
        em_mcu, em_slot, em_pos, em_val, ad_mcu, ad_slot, ad_val = bufs

        p = bitpos >> 3
        r = (bitpos & 7).astype(jnp.uint64)
        raw = jnp.take_along_axis(
            bytes_mat, p[:, None] + offs6[None, :], axis=1
        ).astype(jnp.uint64)
        win48 = (raw << shift6[None, :]).sum(axis=1, dtype=jnp.uint64)
        win48 = (win48 << r) & jnp.uint64((1 << 48) - 1)
        code16 = (win48 >> jnp.uint64(32)).astype(jnp.int32)

        is_dc = coeff == 0
        tab = jnp.where(is_dc, k["slot_dc_tab"][slot], k["slot_ac_tab"][slot])

        ls = jnp.arange(1, 17, dtype=jnp.int32)
        prefixes = code16[:, None] >> (16 - ls)[None, :]
        ok = prefixes <= k["maxcode"][tab][:, 1:]
        any_ok = ok.any(axis=1)
        length = jnp.where(any_ok, jnp.argmax(ok, axis=1).astype(jnp.int32) + 1, 16)
        pref_l = code16 >> (16 - length)
        vidx = jnp.clip(
            k["valptr"][tab, length] + pref_l - k["mincode"][tab, length], 0, 255
        )
        value = k["huffval"][tab, vidx]

        cat = jnp.where(is_dc, jnp.minimum(value, 31), value & 15)
        corrupt = (~any_ok) | (cat > 16)
        need = length + cat
        overrun = bitpos + need > nbits
        die = (~alive) | corrupt | overrun

        extra = (
            (win48 >> (jnp.uint64(48) - jnp.minimum(need, 48).astype(jnp.uint64)))
        ).astype(jnp.int32) & ((jnp.int32(1) << cat) - 1)
        sign = extra >> jnp.maximum(cat - 1, 0)
        neg = extra - (jnp.int32(1) << cat) + 1
        coef_val = jnp.where(cat == 0, 0, jnp.where(sign != 0, extra, neg))

        # Best-effort NULL-block parity uses the lane-local MCU index
        # (same approximation as the NumPy engine; only reachable on
        # corrupt streams -- valid lanes never overrun their grid).
        _, block_ok = _block_index(plan, k, mcu, slot)
        comp = k["slot_comp"][slot]
        dc_null = (~die) & is_dc & (~block_ok) & plan.interleaved

        rs = value
        is_eob = (~is_dc) & (rs == 0)
        zrl = jnp.where(is_dc, 0, rs >> 4)
        new_coeff = jnp.where(is_dc, 1, coeff + zrl)
        ac_corrupt = (~die) & (~is_dc) & (~is_eob) & (new_coeff > 63)
        die = die | dc_null | ac_corrupt
        live = (~die) & alive

        write = live & block_ok & (is_dc | (~is_eob))
        pos = jnp.where(is_dc, 0, k["zigzag"][jnp.clip(new_coeff, 0, 63)])

        upd = lambda buf, v: jax.lax.dynamic_update_slice(  # noqa: E731
            buf, v[None, :].astype(jnp.int32), (n, jnp.int32(0))
        )
        em_mcu = upd(em_mcu, mcu)
        em_slot = upd(em_slot, jnp.where(write, slot, -1))
        em_pos = upd(em_pos, pos)
        em_val = upd(em_val, coef_val)

        cur_diff = jnp.where(live & is_dc, coef_val, cur_diff)
        after_coeff = jnp.where(is_dc, 1, new_coeff + 1)
        block_done = live & (is_eob | (after_coeff >= 64))

        pred_here = dc_pred[lane_iota, comp]
        addw = block_done & block_ok
        ad_mcu = upd(ad_mcu, mcu)
        ad_slot = upd(ad_slot, jnp.where(addw, slot, -1))
        ad_val = upd(ad_val, pred_here)
        dc_pred = dc_pred.at[lane_iota, comp].set(
            jnp.where(block_done, pred_here + cur_diff, pred_here)
        )

        next_slot = jnp.where(block_done, slot + 1, slot)
        wrap = next_slot >= bpm
        mcu = jnp.where(live, mcu + (block_done & wrap), mcu)
        slot = jnp.where(live, jnp.where(wrap, 0, next_slot), slot)
        coeff = jnp.where(live, jnp.where(block_done, 0, after_coeff), coeff)
        bitpos = jnp.where(live, bitpos + need, nbits)
        alive = live

        bufs = (em_mcu, em_slot, em_pos, em_val, ad_mcu, ad_slot, ad_val)
        return (n + 1, bitpos, alive, mcu, slot, coeff, dc_pred, cur_diff, bufs)

    def cond(state):
        return (state[0] < max_steps) & state[2].any()

    i32z = lambda shape: jnp.zeros(shape, dtype=jnp.int32)  # noqa: E731
    bufs0 = (
        i32z((max_steps, S)),
        jnp.full((max_steps, S), -1, dtype=jnp.int32),
        i32z((max_steps, S)),
        i32z((max_steps, S)),
        i32z((max_steps, S)),
        jnp.full((max_steps, S), -1, dtype=jnp.int32),
        i32z((max_steps, S)),
    )
    init = (
        jnp.int32(0),
        i32z(S),
        nbits > 0,
        i32z(S),
        i32z(S),
        i32z(S),
        i32z((S, plan.n_comps)),
        i32z(S),
        bufs0,
    )
    final = jax.lax.while_loop(cond, step, init)
    mcu_counts = final[3]
    em_mcu, em_slot, em_pos, em_val, ad_mcu, ad_slot, ad_val = final[8]

    # ---- global placement (prefix-sum + one big scatter) -------------
    seg_offset = jnp.cumsum(mcu_counts) - mcu_counts  # [S]
    lane = jnp.broadcast_to(lane_iota[None, :], em_mcu.shape)

    def place(mcus, slots):
        gmcu = mcus + seg_offset[lane]
        valid = slots >= 0
        s = jnp.clip(slots, 0, None)
        blk, in_range = _block_index(plan, k, gmcu, s)
        good = valid & in_range
        # mode='drop' discards out-of-range scatter indices.
        return jnp.where(good, blk, total_blocks).reshape(-1)

    coeffs = jnp.zeros((total_blocks, 64), dtype=jnp.int32)
    coeffs = coeffs.at[
        place(em_mcu, em_slot), em_pos.reshape(-1)
    ].set(em_val.reshape(-1), mode="drop")
    dc_col = coeffs[:, 0].at[place(ad_mcu, ad_slot)].add(
        ad_val.reshape(-1), mode="drop"
    )
    coeffs = coeffs.at[:, 0].set(dc_col)
    return mcu_counts, coeffs


def decode_scan_lockstep_jax(
    geom: FrameGeometry,
    info: ScanInfo,
    tables: Dict[Tuple[int, int], HuffTable],
    segments: Sequence[np.ndarray],
    planes: Dict[int, np.ndarray],
) -> int:
    """Host wrapper: pad segments, run the device decode, split planes."""
    plan = _cached_plan(geom, info, tuple(sorted((k, t.spec) for k, t in tables.items())))
    bytes_mat, nbits = _pad_segments(segments)
    total_blocks = sum(geom.by_id(cid).n_blocks for cid in info.component_ids)

    max_nbits = int(nbits.max()) if nbits.size else 0
    # Every symbol consumes >= 1 bit, so bits bound the step count.
    # Round step count and buffer shapes up to powers of two so jit
    # traces are reused across nearby sizes.
    max_steps = max(max_nbits + 1, 64)
    max_steps = 1 << (max_steps - 1).bit_length()
    pad_cols = 1 << (int(bytes_mat.shape[1]) - 1).bit_length()
    if pad_cols > bytes_mat.shape[1]:
        bytes_mat = np.pad(bytes_mat, ((0, 0), (0, pad_cols - bytes_mat.shape[1])))

    counts, coeffs = decode_scan_device(
        plan,
        jnp.asarray(bytes_mat),
        jnp.asarray(nbits, dtype=jnp.int32),
        max_steps,
        total_blocks,
    )
    coeffs = np.asarray(coeffs)
    off = 0
    for cid in info.component_ids:
        n = geom.by_id(cid).n_blocks
        planes[cid][:] = coeffs[off : off + n]
        off += n
    return int(np.asarray(counts).sum())
