"""JAX/TPU lockstep entropy decoder (scan + one-hot engine).

The accelerator port of ``lockstep.py``.  All ECS segments decode
simultaneously, one Huffman symbol per lane per step.  The TPU mapping is
driven by two measured facts about this hardware (see memory/bench notes):

  * per-lane dynamic gathers (take_along_axis) cost ~350us/step -- every
    data-dependent load is therefore a ONE-HOT masked reduction (VPU) or
    a one-hot matmul (MXU), never a gather;
  * loop iterations with HBM-carried state cost ~100us regardless of
    body size -- the loop is ``lax.scan`` with ``unroll`` so several
    symbol steps amortize one iteration, and emissions leave the loop as
    scan ys (no loop-carried emission buffers at all).

Correctness contract (shared with the NumPy engine and the C++ kernel):
segments are independent (T.81 resets DC prediction at RST markers); DC
is emitted as the raw diff at DC time plus an order-independent
scatter-ADD of the predictor at block completion; global placement uses
an exclusive prefix-sum of per-segment MCU counts.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import ZIGZAG
from ..geometry import FrameGeometry, ScanInfo
from ..tables import HuffTable, derive_table
from .lockstep import ScanPlan, _pad_segments, build_scan_plan

UNROLL = 8


@lru_cache(maxsize=256)
def _cached_plan(geom, info, spec_items) -> ScanPlan:
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
        # one-hot width = longest table, padded to a lane multiple
        huffval=c(plan.huffval[:, : ((plan.max_codes + 63) // 64) * 64]),
        zigzag=c(ZIGZAG),
    )


def _slot_lookup(table: jnp.ndarray, slot: jnp.ndarray) -> jnp.ndarray:
    """table[slot] for a tiny per-slot table, as a select chain (no gather)."""
    n = int(table.shape[0])
    out = jnp.broadcast_to(table[0], slot.shape)
    for s in range(1, n):
        out = jnp.where(slot == s, table[s], out)
    return out


def _block_index(plan: ScanPlan, k, gmcu, slot):
    """Global block index of (mcu, slot); select-chain lookups, any shape."""
    if plan.interleaved:
        my = gmcu // plan.m_x
        mx = gmcu % plan.m_x
        seq = (
            my * _slot_lookup(k["slot_V"], slot) + _slot_lookup(k["slot_v"], slot)
        ) * _slot_lookup(k["slot_bx"], slot) + (
            mx * _slot_lookup(k["slot_H"], slot) + _slot_lookup(k["slot_h"], slot)
        )
    else:
        seq = gmcu * plan.blocks_per_mcu + _slot_lookup(k["slot_h"], slot)
    ok = seq < _slot_lookup(k["slot_nblocks"], slot)
    return _slot_lookup(k["slot_plane_offset"], slot) + seq, ok


def _iota_row(n: int) -> jnp.ndarray:
    """[1, n] int32 iota (TPU/Pallas-safe: no 1-D iota)."""
    return jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)


def _onehot_pick(table_2d: jnp.ndarray, idx: jnp.ndarray, iota: jnp.ndarray):
    """rowwise[lane] = table_2d[lane, idx[lane]] as one-hot masked sum."""
    sel = iota == idx[:, None]
    return jnp.where(sel, table_2d, 0).sum(axis=1, dtype=table_2d.dtype)


def _symbol_step(plan: ScanPlan, k, words, nbits, iota_w, iota256, carry):
    """Decode one symbol on every live lane.  Pure one-hot/select math in
    uint32 (uint64 is emulated on TPU and costs ~2-3x).

    carry: (bitpos, alive, mcu, slot, coeff, dc_pred[S,C], cur_diff)
    returns (new_carry, (em_key, em_val, ad_key, ad_val)) with keys packed
    as (mcu*bpm + slot)*64 + pos + 1 (0 = invalid).
    """
    bitpos, alive, mcu, slot, coeff, dc_pred, cur_diff = carry
    S = bitpos.shape[0]

    # ---- 32-bit window via one-hot word selection ---------------------
    # A symbol consumes <= 31 bits (16 code + 15 extra), so a 32-bit
    # window suffices.  bits [bitpos, bitpos+32) = (w0 << r) | (w1 >> 32-r).
    widx = bitpos >> 5
    sel0 = iota_w == widx[:, None]
    sel1 = iota_w == (widx + 1)[:, None]
    w0 = jnp.where(sel0, words, 0).sum(axis=1, dtype=jnp.uint32)
    w1 = jnp.where(sel1, words, 0).sum(axis=1, dtype=jnp.uint32)
    r = (bitpos & 31).astype(jnp.uint32)
    win = jnp.where(
        r == 0, w0, (w0 << r) | (w1 >> (jnp.uint32(32) - jnp.maximum(r, 1)))
    )
    code16 = (win >> jnp.uint32(16)).astype(jnp.int32)

    # ---- canonical decode ---------------------------------------------
    is_dc = coeff == 0
    tab = jnp.where(
        is_dc,
        _slot_lookup(k["slot_dc_tab"], slot),
        _slot_lookup(k["slot_ac_tab"], slot),
    )
    T = int(k["maxcode"].shape[0])
    maxc = jnp.broadcast_to(k["maxcode"][0][1:], (S, 16))
    for t in range(1, T):
        maxc = jnp.where((tab == t)[:, None], k["maxcode"][t][1:], maxc)
    ls = _iota_row(16) + 1  # [1, 16] lengths 1..16
    prefixes = code16[:, None] >> (16 - ls)
    ok_mat = prefixes <= maxc
    any_ok = ok_mat.any(axis=1)
    # first-true as a one-hot (cumsum==1 & ok): argmax-free, Pallas-safe.
    first_ok = ok_mat & (jnp.cumsum(ok_mat.astype(jnp.int32), axis=1) == 1)
    length = jnp.where(
        any_ok, (first_ok * ls).sum(axis=1, dtype=jnp.int32), 16
    )
    pref_l = code16 >> (16 - length)

    # valptr/mincode[tab, length]: stack per-t rows then one-hot over the
    # 16 lengths (avoids 17-deep select chains).
    vp_rows = jnp.broadcast_to(k["valptr"][0][1:], (S, 16))
    mc_rows = jnp.broadcast_to(k["mincode"][0][1:], (S, 16))
    for t in range(1, T):
        sel = (tab == t)[:, None]
        vp_rows = jnp.where(sel, k["valptr"][t][1:], vp_rows)
        mc_rows = jnp.where(sel, k["mincode"][t][1:], mc_rows)
    base = _onehot_pick(vp_rows, length - 1, _iota_row(16))
    minc = _onehot_pick(mc_rows, length - 1, _iota_row(16))
    vidx = jnp.clip(base + pref_l - minc, 0, iota256.shape[1] - 1)

    # value = huffval[tab, vidx] via one-hot matmul on the MXU: bf16 holds
    # integers <= 256 exactly.
    oh = (iota256 == vidx[:, None]).astype(jnp.bfloat16)  # [S, 256]
    hv_cols = k["huffval"].astype(jnp.bfloat16).T  # [256, T]
    picked = jnp.dot(oh, hv_cols, preferred_element_type=jnp.float32)  # [S, T]
    value = picked[:, 0].astype(jnp.int32)
    for t in range(1, T):
        value = jnp.where(tab == t, picked[:, t].astype(jnp.int32), value)

    # cat clamped to 16 so the 32-bit window shifts stay in range; the
    # corrupt test uses the raw value (DC categories > 16 kill the lane,
    # same as the NumPy engine).
    cat = jnp.where(is_dc, jnp.minimum(value, 16), value & 15)
    corrupt = (~any_ok) | (is_dc & (value > 16))
    need = length + cat
    overrun = bitpos + need > nbits
    die = (~alive) | corrupt | overrun

    # Window bits [length, length+cat) are the extra bits.
    extra = (win >> (jnp.uint32(32) - jnp.minimum(need, 32).astype(jnp.uint32))).astype(
        jnp.int32
    ) & ((jnp.int32(1) << cat) - 1)
    sign = extra >> jnp.maximum(cat - 1, 0)
    neg = extra - (jnp.int32(1) << cat) + 1
    coef_val = jnp.where(cat == 0, 0, jnp.where(sign != 0, extra, neg))

    # Best-effort NULL-block parity (lane-local MCU; corrupt streams
    # only).  One compare replaces the div/mod block-index math: grids
    # are MCU-divisible, so block_ok == (mcu < n_mcus) exactly.
    block_ok = mcu < plan.n_mcus
    comp = _slot_lookup(k["slot_comp"], slot)
    dc_null = (~die) & is_dc & (~block_ok) & plan.interleaved

    rs = value
    is_eob = (~is_dc) & (rs == 0)
    zrl = jnp.where(is_dc, 0, rs >> 4)
    new_coeff = jnp.where(is_dc, 1, coeff + zrl)
    ac_corrupt = (~die) & (~is_dc) & (~is_eob) & (new_coeff > 63)
    die = die | dc_null | ac_corrupt
    live = (~die) & alive

    write = live & block_ok & (is_dc | (~is_eob))
    nc = jnp.clip(new_coeff, 0, 63)
    zz = _onehot_pick(
        jnp.broadcast_to(k["zigzag"][None, :], (S, 64)), nc, _iota_row(64)
    )
    pos = jnp.where(is_dc, 0, zz)

    # Emission keys: mcu*BPMx64 + slot*64 + pos, +1 so 0 = invalid.
    em_key = jnp.where(write, (mcu * plan.blocks_per_mcu + slot) * 64 + pos + 1, 0)
    em_val = coef_val

    cur_diff = jnp.where(live & is_dc, coef_val, cur_diff)
    after_coeff = jnp.where(is_dc, 1, new_coeff + 1)
    block_done = live & (is_eob | (after_coeff >= 64))

    # dc_pred[lane, comp]: C is tiny -> one-hot select/update.
    C = int(dc_pred.shape[1])
    comp_oh = comp[:, None] == _iota_row(C)
    pred_here = jnp.where(comp_oh, dc_pred, 0).sum(axis=1, dtype=jnp.int32)
    addw = block_done & block_ok
    ad_key = jnp.where(addw, (mcu * plan.blocks_per_mcu + slot) * 64 + 1, 0)
    ad_val = pred_here
    dc_pred = jnp.where(
        comp_oh & block_done[:, None], (pred_here + cur_diff)[:, None], dc_pred
    )

    next_slot = jnp.where(block_done, slot + 1, slot)
    wrap = next_slot >= plan.blocks_per_mcu
    mcu = jnp.where(live, mcu + (block_done & wrap), mcu)
    slot = jnp.where(live, jnp.where(wrap, 0, next_slot), slot)
    coeff = jnp.where(live, jnp.where(block_done, 0, after_coeff), coeff)
    bitpos = jnp.where(live, bitpos + need, nbits)
    alive = live

    carry = (bitpos, alive, mcu, slot, coeff, dc_pred, cur_diff)
    return carry, (em_key, em_val, ad_key, ad_val)


@partial(
    jax.jit,
    static_argnames=("plan", "max_steps", "total_blocks", "frames", "segs_per_frame"),
)
def decode_scan_device(
    plan: ScanPlan,
    words: jnp.ndarray,  # [S, Wn] uint32 big-endian segment words
    nbits: jnp.ndarray,  # [S] int32
    max_steps: int,
    total_blocks: int,  # blocks per frame
    frames: int = 1,
    segs_per_frame: int = 0,  # 0 -> S (single frame)
):
    """On-device scan decode -> (counts[S], coeffs[frames*total_blocks, 64]).

    With frames > 1, lanes are grouped per frame (segs_per_frame each) and
    MCU prefix sums reset per frame -- the Motion-JPEG batch path.
    """
    k = _plan_consts(plan)
    S = words.shape[0]
    spf = segs_per_frame or S
    iota_w = jnp.arange(words.shape[1], dtype=jnp.int32)[None, :]
    iota256 = jnp.arange(k["huffval"].shape[1], dtype=jnp.int32)[None, :]

    init = (
        jnp.zeros(S, jnp.int32),
        nbits > 0,
        jnp.zeros(S, jnp.int32),
        jnp.zeros(S, jnp.int32),
        jnp.zeros(S, jnp.int32),
        jnp.zeros((S, plan.n_comps), jnp.int32),
        jnp.zeros(S, jnp.int32),
    )

    def step(carry, _):
        return _symbol_step(plan, k, words, nbits, iota_w, iota256, carry)

    carry, (em_key, em_val, ad_key, ad_val) = jax.lax.scan(
        step, init, None, length=max_steps, unroll=UNROLL
    )
    mcu_counts = carry[2]
    # True when some lane still had symbols left: the caller's optimistic
    # step bound was too small and must retry with a larger one.
    starved = carry[1].any()
    coeffs = _place_emissions(
        plan, k, mcu_counts, em_key, em_val, ad_key, ad_val,
        frames, spf, total_blocks,
    )
    return mcu_counts, coeffs, starved


def _place_emissions(
    plan, k, mcu_counts, em_key, em_val, ad_key, ad_val,
    frames, spf, total_blocks,
):
    """Global placement: prefix-sum of per-lane MCU counts + one scatter."""
    S = mcu_counts.shape[0]
    per_frame = mcu_counts.reshape(frames, spf)
    seg_offset = (jnp.cumsum(per_frame, axis=1) - per_frame).reshape(S)

    lane = jnp.broadcast_to(jnp.arange(S)[None, :], em_key.shape)
    frame_of_lane = lane // spf

    def place(keys):
        valid = keys > 0
        kk = keys - 1
        local_mcu = kk // (plan.blocks_per_mcu * 64)
        rem = kk % (plan.blocks_per_mcu * 64)
        slot = rem // 64
        pos = rem % 64
        gmcu = local_mcu + seg_offset[lane]
        blk, in_range = _block_index(plan, k, gmcu, slot)
        blk = blk + frame_of_lane * total_blocks
        good = valid & in_range
        return jnp.where(good, blk, frames * total_blocks).reshape(-1), pos.reshape(-1)

    coeffs = jnp.zeros((frames * total_blocks, 64), dtype=jnp.int32)
    ab, apos = place(em_key)
    coeffs = coeffs.at[ab, apos].set(em_val.reshape(-1), mode="drop")
    db, _ = place(ad_key)
    dc_col = coeffs[:, 0].at[db].add(ad_val.reshape(-1), mode="drop")
    coeffs = coeffs.at[:, 0].set(dc_col)
    return coeffs


def pack_words(bytes_cat: np.ndarray, lens: np.ndarray):
    """Vectorized pack: concatenated segment bytes -> ([S, Wn] u32, nbits).

    Column count is the max segment length rounded to a multiple of 64
    bytes (+8 slack for the word lookahead) -- tight enough to keep the
    tunnel upload small, coarse enough to reuse jit traces.
    """
    S = lens.size
    maxlen = int(lens.max()) if S else 0
    pad = ((maxlen + 8 + 63) // 64) * 64
    mat = np.zeros((S, pad), dtype=np.uint8)
    if bytes_cat.size:
        starts = np.cumsum(lens) - lens
        rows = np.repeat(np.arange(S), lens)
        cols = np.arange(bytes_cat.size) - np.repeat(starts, lens)
        mat[rows, cols] = bytes_cat
    words = mat.reshape(S, -1, 4).astype(np.uint32)
    words = (
        (words[:, :, 0] << 24)
        | (words[:, :, 1] << 16)
        | (words[:, :, 2] << 8)
        | words[:, :, 3]
    )
    return words, (lens * 8).astype(np.int64)


def _segments_to_words(segments: Sequence[np.ndarray]):
    """Pack a list of unstuffed segment byte arrays."""
    lens = np.array([s.size for s in segments], dtype=np.int64)
    bytes_cat = (
        np.concatenate([np.asarray(s, np.uint8) for s in segments])
        if lens.sum()
        else np.zeros(0, np.uint8)
    )
    return pack_words(bytes_cat, lens)


def _max_steps_for(
    nbits: np.ndarray, plan: ScanPlan, ri: int, optimistic: bool = True
) -> int:
    max_nbits = int(nbits.max()) if nbits.size else 0
    bound = max_nbits + 1
    if ri:
        # <= 65 symbols per block, ri*bpm blocks per segment (+ slack for
        # trailing-padding garbage the reference also decodes).
        bound = min(bound, 65 * (ri * plan.blocks_per_mcu + 2))
    if optimistic:
        # Real streams average well over 2.5 bits per symbol; the decoder
        # reports starvation and the caller retries with the hard bound.
        bound = min(bound, max_nbits * 2 // 5 + 8)
        steps = max(64, bound)
        return ((steps + 127) // 128) * 128  # 128-step buckets
    steps = max(64, bound)
    return 1 << (steps - 1).bit_length()


def decode_scan_lockstep_jax(
    geom: FrameGeometry,
    info: ScanInfo,
    tables: Dict[Tuple[int, int], HuffTable],
    segments: Sequence[np.ndarray],
    planes: Dict[int, np.ndarray],
    ri: int = 0,
) -> int:
    """Host wrapper: pack segments, run the device decode, split planes."""
    plan = _cached_plan(
        geom, info, tuple(sorted((k, t.spec) for k, t in tables.items()))
    )
    words, nbits = _segments_to_words(segments)
    total_blocks = sum(geom.by_id(cid).n_blocks for cid in info.component_ids)
    max_steps = _max_steps_for(nbits, plan, ri)
    hard_cap = _max_steps_for(nbits, plan, ri, optimistic=False)

    while True:
        counts, coeffs, starved = decode_scan_device(
            plan,
            jnp.asarray(words),
            jnp.asarray(nbits, dtype=jnp.int32),
            max_steps,
            total_blocks,
        )
        if not bool(starved) or max_steps >= hard_cap:
            break
        max_steps = min(max_steps * 4, hard_cap)
    coeffs = np.asarray(coeffs)
    off = 0
    for cid in info.component_ids:
        n = geom.by_id(cid).n_blocks
        planes[cid][:] = coeffs[off : off + n]
        off += n
    return int(np.asarray(counts).sum())
