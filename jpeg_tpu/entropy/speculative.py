"""Speculative parallel decode of RST-less entropy streams.

The reference decodes any baseline ECS serially (read_ecs,
decoder.c:364-388; segment ends detected byte-by-byte in io.c:247-274).
With restart markers the stream is cut into independent lanes
(lockstep_jax); WITHOUT them the bitstream has no known entry points --
bit positions and the DC chain (decoder.c:350-355) are sequential.

This module is the "ring-attention analog" for that case (SURVEY §2.2
row 4; PAPERS.md GPU-decode recipe, arxiv 2111.09219): Huffman streams
self-synchronize, so a decoder started at a wrong position converges to
the true symbol boundaries after a short prefix.  Three phases:

  PROBE   split the unstuffed stream into S byte-aligned chunks; for
          every chunk spawn ``bpm`` speculative lanes (one per possible
          intra-MCU phase -- the Huffman TABLE sequence depends on the
          slot, so bit convergence alone is not enough for interleaved
          color scans).  Each lane decodes its chunk plus the next (the
          overflow window), recording its block-boundary states
          (bit position, slot) -- no coefficients are kept.
  RESOLVE (host, tiny data) authority flows from lane 0 (which starts
          at the true stream origin): chunk i+1 is synchronized if the
          authoritative end boundary of chunk i appears among chunk
          i+1's recorded boundaries with the same slot phase.  Links
          that miss re-probe from the now-known true state (batched, a
          few rounds); pathological streams fall back to the serial
          oracle.
  FINAL   every chunk re-decodes its authoritative span from its true
          start state, emitting coefficients keyed by GLOBAL block
          ordinal; per-lane DC prefixes (the per-segment exclusive
          prefix-sum of decoder.c:350-355, here per-chunk) are fixed up
          afterwards, exactly like the restart-segment engines.

Output is bit-identical to the serial oracle on valid streams; invalid
streams may deviate (documented contract, PARITY.md) and anything
unresolvable falls back to the oracle.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import ZIGZAG
from ..errors import CorruptStream
from ..geometry import FrameGeometry, ScanInfo
from ..tables import HuffTable
from .lockstep import ScanPlan, build_scan_plan

UNROLL = 8


def _win_select(words_flat, chunk_of_lane, wn, tgt):
    """words[chunk_of_lane, tgt] as one flat gather ([L]-sized)."""
    idx = chunk_of_lane * wn + jnp.clip(tgt, 0, wn - 1)
    return jnp.take(words_flat, idx, mode="clip")


def _spec_step(plan: ScanPlan, consts, carry):
    """One Huffman symbol on every speculative lane.

    Shares the scalarized math of lockstep_jax._symbol_step_scalar
    (huffman.c:193-271 semantics) with three changes: the window refills
    by a flat GATHER (windows here are whole chunks -- thousands of
    words -- so the row-select loop of the restart engine would dominate),
    the MCU counter is replaced by a local block ordinal ``blk``, and
    block starts emit a boundary record (bitpos<<4 | slot) used by the
    resolution phase; lanes stop AT the first boundary >= stop_bit.
    """
    (words_flat, chunk_of_lane, wn, nbits, stop_bit, nblk_cap,
     hv_cols, iota_hv) = consts
    (bitpos, alive, blk, slot, coeff, dc_pred, cur_diff,
     w0, w1, pend_key, pend_val) = carry
    T = plan.maxcode.shape[0]
    bpm = plan.blocks_per_mcu

    def sl(table, s):
        out = jnp.full_like(s, int(table[0]))
        for i in range(1, bpm):
            out = jnp.where(s == i, int(table[i]), out)
        return out

    def tabc(col, tab):
        out = jnp.full_like(tab, int(col[0]))
        for t in range(1, T):
            out = jnp.where(tab == t, int(col[t]), out)
        return out

    is_dc = coeff == 0
    # Block start: emit the boundary record; lanes at/past their stop
    # boundary die here WITHOUT consuming bits (io.c:247-274 ECS-end
    # analog: the boundary itself is the handoff state).
    at_start = alive & is_dc
    stop_here = at_start & (bitpos >= stop_bit)
    meta_val = jnp.where(
        at_start & (blk < nblk_cap), ((bitpos << 4) | slot) + 1, 0
    )
    meta_key = jnp.where(at_start, blk, nblk_cap)

    # ---- 32-bit window from the carried word pair ----------------------
    r = (bitpos & 31).astype(jnp.uint32)
    win = jnp.where(
        r == 0, w0, (w0 << r) | (w1 >> (jnp.uint32(32) - jnp.maximum(r, 1)))
    )
    code16 = (win >> jnp.uint32(16)).astype(jnp.int32)

    tab = jnp.where(
        is_dc, sl(plan.slot_dc_tab, slot), sl(plan.slot_ac_tab, slot)
    )
    length = jnp.full_like(code16, 16)
    base = jnp.zeros_like(code16)
    minc = jnp.zeros_like(code16)
    any_ok = jnp.zeros_like(alive)
    for l in range(16, 0, -1):
        ok = (code16 >> (16 - l)) <= tabc(plan.maxcode[:, l], tab)
        length = jnp.where(ok, l, length)
        base = jnp.where(ok, tabc(plan.valptr[:, l], tab), base)
        minc = jnp.where(ok, tabc(plan.mincode[:, l], tab), minc)
        any_ok = any_ok | ok
    pref_l = code16 >> (16 - length)
    vidx = jnp.clip(base + pref_l - minc, 0, iota_hv.shape[1] - 1)

    oh = (iota_hv == vidx[:, None]).astype(jnp.bfloat16)
    picked = jnp.dot(oh, hv_cols, preferred_element_type=jnp.float32)
    value = picked[:, 0].astype(jnp.int32)
    for t in range(1, T):
        value = jnp.where(tab == t, picked[:, t].astype(jnp.int32), value)

    cat = jnp.where(is_dc, jnp.minimum(value, 16), value & 15)
    corrupt = (~any_ok) | (is_dc & (value > 16))
    need = length + cat
    overrun = bitpos + need > nbits
    die = (~alive) | corrupt | overrun | stop_here | (blk >= nblk_cap)

    extra = (
        win >> (jnp.uint32(32) - jnp.minimum(need, 32).astype(jnp.uint32))
    ).astype(jnp.int32) & ((jnp.int32(1) << cat) - 1)
    sign = extra >> jnp.maximum(cat - 1, 0)
    neg = extra - (jnp.int32(1) << cat) + 1
    coef_val = jnp.where(cat == 0, 0, jnp.where(sign != 0, extra, neg))

    comp = sl(plan.slot_comp, slot)
    rs = value
    is_eob = (~is_dc) & (rs == 0)
    zrl = jnp.where(is_dc, 0, rs >> 4)
    new_coeff = jnp.where(is_dc, 1, coeff + zrl)
    ac_corrupt = (~die) & (~is_dc) & (~is_eob) & (new_coeff > 63)
    die = die | ac_corrupt
    live = (~die) & alive

    write = live & (~is_dc) & (~is_eob)
    nc = jnp.clip(new_coeff, 0, 63)
    zz = jnp.zeros_like(nc)
    for j in range(1, 64):
        zz = jnp.where(nc == j, int(ZIGZAG[j]), zz)

    em_key = jnp.where(write, blk * 64 + zz + 1, 0)
    em_val = coef_val
    em_key = jnp.where(pend_key > 0, pend_key, em_key)
    em_val = jnp.where(pend_key > 0, pend_val, em_val)

    cur_diff = jnp.where(live & is_dc, coef_val, cur_diff)
    after_coeff = jnp.where(is_dc, 1, new_coeff + 1)
    block_done = live & (is_eob | (after_coeff >= 64))

    pred_here = dc_pred[0]
    for c in range(1, plan.n_comps):
        pred_here = jnp.where(comp == c, dc_pred[c], pred_here)
    pend_key = jnp.where(block_done, blk * 64 + 1, 0)
    pend_val = pred_here + cur_diff
    dc_pred = tuple(
        jnp.where(block_done & (comp == c), pred_here + cur_diff, dc_pred[c])
        for c in range(plan.n_comps)
    )

    next_slot = jnp.where(block_done, slot + 1, slot)
    wrap = next_slot >= bpm
    blk = jnp.where(live, blk + block_done, blk)
    slot = jnp.where(live, jnp.where(wrap, 0, next_slot), slot)
    coeff = jnp.where(live, jnp.where(block_done, 0, after_coeff), coeff)
    bitpos = jnp.where(live, bitpos + need, bitpos)
    alive = live

    # ---- window refill: gather (chunks are thousands of words wide) ----
    widx_new = bitpos >> 5
    crossed = live & (widx_new != ((bitpos - need) >> 5))
    fetched = _win_select(words_flat, chunk_of_lane, wn, widx_new + 1)
    w0 = jnp.where(crossed, w1, w0)
    w1 = jnp.where(crossed, fetched, w1)

    carry = (bitpos, alive, blk, slot, coeff, dc_pred, cur_diff,
             w0, w1, pend_key, pend_val)
    return carry, (em_key, em_val, meta_key, meta_val)


def _hv_consts(plan: ScanPlan):
    vpad = ((plan.max_codes + 63) // 64) * 64
    hv_cols = jnp.asarray(
        plan.huffval[:, :vpad].astype(np.float32)
    ).astype(jnp.bfloat16).T
    iota_hv = jnp.arange(vpad, dtype=jnp.int32)[None, :]
    return hv_cols, iota_hv


def _init_carry(plan, words_flat, chunk_of_lane, wn, start_bit, start_slot,
                nbits):
    z = jnp.zeros_like(start_bit)
    widx = start_bit >> 5
    w0 = _win_select(words_flat, chunk_of_lane, wn, widx)
    w1 = _win_select(words_flat, chunk_of_lane, wn, widx + 1)
    return (
        start_bit,
        start_bit < nbits,
        z,
        start_slot,
        z,
        tuple(z for _ in range(plan.n_comps)),
        z,
        w0,
        w1,
        z,
        z,
    )


@partial(jax.jit, static_argnames=("plan", "max_steps", "maxb"))
def _probe(plan: ScanPlan, words, chunk_of_lane, nbits, start_bit,
           start_slot, stop_bit, max_steps: int, maxb: int):
    """Speculative boundary probe: no coefficients, just block-boundary
    records per lane.  Returns (meta [L, maxb] packed (bit<<4|slot)+1 in
    block order, alive [L] -- lanes still live at scan end mean the step
    bound starved and the caller must retry larger)."""
    S, wn = words.shape
    words_flat = words.reshape(-1)
    hv_cols, iota_hv = _hv_consts(plan)
    consts = (words_flat, chunk_of_lane, wn, nbits, stop_bit,
              jnp.int32(maxb), hv_cols, iota_hv)
    init = _init_carry(plan, words_flat, chunk_of_lane, wn, start_bit,
                       start_slot, nbits)

    def step(carry, _):
        carry, (_, _, mk, mv) = _spec_step(plan, consts, carry)
        return carry, (mk, mv)

    carry, (mkey, mval) = jax.lax.scan(
        step, init, None, length=max_steps, unroll=UNROLL
    )
    # Extract per-lane boundary lists: sort along steps so valid records
    # (ascending blk, unique) lead; scatter would cost steps*L attempts.
    L = start_bit.shape[0]
    key = jnp.where(mval > 0, mkey, maxb + 1).T  # [L, steps]
    _, sorted_val = jax.lax.sort((key, mval.T), dimension=1, num_keys=1)
    take = min(maxb, sorted_val.shape[1])
    meta = jnp.zeros((L, maxb), jnp.int32)
    meta = meta.at[:, :take].set(sorted_val[:, :take])
    return meta, carry[1]


@partial(jax.jit, static_argnames=("plan", "max_steps", "total_blocks"))
def _final_decode(plan: ScanPlan, words, chunk_of_lane, nbits, start_bit,
                  start_slot, g0, nblk, max_steps: int, total_blocks: int):
    """Authoritative re-decode: lane i emits its nblk[i] blocks keyed by
    global block ordinal g0[i]+blk.  DC values are lane-local cumulative
    (predictors start at 0); the caller adds the per-lane per-component
    prefix (decoder.c:350-355 chain, prefix-summed over chunks).
    Returns (coeffs [total_blocks, 64] in GLOBAL BLOCK order, dc_final
    [C, L], starved)."""
    S, wn = words.shape
    words_flat = words.reshape(-1)
    hv_cols, iota_hv = _hv_consts(plan)
    consts = (words_flat, chunk_of_lane, wn, nbits,
              jnp.full_like(start_bit, 1 << 30), nblk, hv_cols, iota_hv)
    init = _init_carry(plan, words_flat, chunk_of_lane, wn, start_bit,
                       start_slot, nbits)

    def step(carry, _):
        carry, (ek, ev, _, _) = _spec_step(plan, consts, carry)
        return carry, (ek, ev)

    carry, (em_key, em_val) = jax.lax.scan(
        step, init, None, length=max_steps, unroll=UNROLL
    )
    kk = em_key - 1  # invalid -> -1
    gblk = g0[None, :] + (kk >> 6)
    pos = kk & 63
    oob = total_blocks * 64
    flat = jnp.where(em_key > 0, gblk * 64 + pos, oob).reshape(-1)
    out = jnp.zeros(total_blocks * 64, jnp.int32)
    # write-once slots: scatter-set beats scatter-add ~1.5x on v5e
    out = out.at[flat].set(em_val.reshape(-1), mode="drop")
    dc_final = jnp.stack(carry[5])  # [C, L]
    starved = (carry[1] & (carry[2] < nblk)).any()
    return out.reshape(total_blocks, 64), dc_final, starved


def _unpack_meta(meta_row: np.ndarray):
    """[(abs handled by caller)] -> (rel_bits, slots) of valid records."""
    v = meta_row[meta_row > 0] - 1
    return (v >> 4).astype(np.int64), (v & 15).astype(np.int64)


def decode_scan_speculative_jax(
    geom: FrameGeometry,
    info: ScanInfo,
    tables: Dict[Tuple[int, int], HuffTable],
    segment: np.ndarray,  # one unstuffed ECS (uint8)
    planes: Dict[int, np.ndarray],
    lanes: int = 128,
    max_rounds: int = 12,
) -> int:
    """Decode one RST-less ECS on up to ``lanes`` speculative chunks.

    Falls back to the serial oracle whenever resolution fails (corrupt
    or pathological streams), keeping the documented exactness contract.
    Returns decoded MCUs.
    """
    from .lockstep_jax import _cached_plan

    plan = _cached_plan(
        geom, info, tuple(sorted((k, t.spec) for k, t in tables.items()))
    )
    bpm = plan.blocks_per_mcu
    n = int(segment.size)
    total_blocks = sum(
        geom.by_id(cid).n_blocks for cid in info.component_ids
    )

    def fallback():
        from .serial import decode_scan_serial

        return decode_scan_serial(geom, info, tables, [segment], planes)

    # Chunking: >=1 KiB per chunk so probe step counts stay bounded.
    # The chunk size is quantized to powers of two so the jitted probe /
    # final-decode shapes recur across streams (jit cache reuse).
    S = int(min(lanes, max(1, n // 1024)))
    if S < 4 or bpm > 16:
        return fallback()
    cb = 1 << (-(-n // S) - 1).bit_length()  # pow2 chunk bytes
    S = -(-n // cb)
    # Quantize the lane count too (pad chunks are empty: nbits=0 decodes
    # nothing) -- together with the pow2 chunk size, probe/final shapes
    # take few distinct values across real streams.
    S_pad = -(-S // 8) * 8

    # Windows: chunk i plus its successor, padded to a common word width.
    win_bytes = min(2 * cb, n)  # lane S-1 simply has fewer bits
    wn = (win_bytes + 8 + 3) // 4 + 2
    wmat = np.zeros((S_pad, wn * 4), dtype=np.uint8)
    starts = np.arange(S_pad) * cb
    for i in range(S):
        lo = i * cb
        hi = min(lo + 2 * cb, n)
        wmat[i, : hi - lo] = segment[lo:hi]
    words = (
        wmat.reshape(S_pad, wn, 4).astype(np.uint32)
        << np.array([24, 16, 8, 0])
    ).sum(axis=2).astype(np.uint32)
    win_bits = np.maximum(np.minimum(starts + 2 * cb, n) * 8 - starts * 8, 0)
    chunk_bits = np.maximum(
        np.minimum(starts + cb, n) * 8 - starts * 8, 0
    )  # stop offsets

    # Probe round 0: bpm phase variants per chunk (padded chunks are
    # dead lanes: win_bits=0).
    L = S_pad * bpm
    chunk_of_lane = np.repeat(np.arange(S_pad, dtype=np.int32), bpm)
    start_slot = np.tile(np.arange(bpm, dtype=np.int32), S_pad)
    start_bit = np.zeros(L, np.int32)
    nbits_l = win_bits[chunk_of_lane].astype(np.int32)
    stop_l = chunk_bits[chunk_of_lane].astype(np.int32)
    # Block-boundary capacity: photographic content averages ~30+ bits
    # per block; start tight (the meta download rides the host link) and
    # grow on saturation (a lane whose record count hits maxb may have
    # dropped boundaries).  Step bound likewise starts at the measured
    # ~6 bits/symbol average and grows on starvation.
    maxb = int(min(2 * total_blocks + 4, win_bits.max() // 20 + 32))
    max_steps = int(win_bits.max() // 6 + 64)
    hard_steps = int(win_bits.max() + 2)
    maxb_hard = int(min(2 * total_blocks + 4, win_bits.max() // 4 + 8))

    jw = jnp.asarray(words)
    jcl = jnp.asarray(chunk_of_lane)

    def run_probe(sbit, sslot, nb, stop, steps):
        nonlocal maxb
        while True:
            meta, alive = _probe(
                plan, jw, jcl, jnp.asarray(nb), jnp.asarray(sbit),
                jnp.asarray(sslot), jnp.asarray(stop), steps, maxb,
            )
            meta = np.asarray(meta)
            starved = bool(np.asarray(alive).any())
            saturated = bool(((meta > 0).sum(axis=1) >= maxb).any())
            if saturated and maxb < maxb_hard:
                maxb = min(maxb_hard, maxb * 2)
                continue
            if not starved or steps >= hard_steps:
                return meta
            steps = min(hard_steps, steps * 3 // 2)

    meta0 = run_probe(start_bit, start_slot, nbits_l, stop_l, max_steps)

    # ---- resolution (host; data is [S*bpm, maxb] i32) ------------------
    # Authoritative state per chunk i: (abs bit, slot) of its first block,
    # its boundary list, and its block count to the stop boundary.
    auth_bits = [None] * S  # per chunk: np arrays of abs bit positions
    auth_slots = [None] * S
    auth_src = [None] * S  # (kind, lane_or_round_idx, j0) for final pass
    chunk_start_abs = starts * 8

    def boundaries_of(meta_row, chunk):
        rb, sl_ = _unpack_meta(meta_row)
        return rb + chunk_start_abs[chunk], sl_

    # chunk 0: phase-0 lane is the true decode.
    b, sl_ = boundaries_of(meta0[0 * bpm + 0], 0)
    if b.size == 0 or b[0] != 0 or sl_[0] != 0:
        return fallback()
    auth_bits[0], auth_slots[0] = b, sl_
    auth_src[0] = ("probe0", 0, 0)

    # Pending re-probes accumulate per round.
    reprobe_meta: Dict[int, np.ndarray] = {}  # chunk -> boundary meta row
    reprobe_start: Dict[int, Tuple[int, int]] = {}

    for rnd in range(max_rounds):
        # Extend the authoritative chain as far as possible.
        progressed = False
        failed: list = []
        i = 0
        while i < S - 1:
            if auth_bits[i] is None:
                break
            if auth_bits[i + 1] is not None:
                i += 1
                continue
            # End state of chunk i = its final boundary (first >= chunk
            # end); it must exist past the stop offset.
            eb, es = auth_bits[i][-1], auth_slots[i][-1]
            if eb < chunk_start_abs[i] + int(chunk_bits[i]) and i + 1 < S:
                # Chunk i's authoritative decode died before reaching its
                # stop boundary: corrupt stream region.
                return fallback()
            matched = False
            for variant in range(bpm):
                vb, vs = boundaries_of(meta0[(i + 1) * bpm + variant], i + 1)
                k = np.searchsorted(vb, eb)
                if k < vb.size and vb[k] == eb and vs[k] == es:
                    auth_bits[i + 1] = vb[k:]
                    auth_slots[i + 1] = vs[k:]
                    auth_src[i + 1] = ("probe0", (i + 1) * bpm + variant, k)
                    matched = True
                    progressed = True
                    break
            if not matched and (i + 1) in reprobe_meta:
                vb, vs = boundaries_of(reprobe_meta[i + 1], i + 1)
                if vb.size and vb[0] == eb and vs[0] == es:
                    auth_bits[i + 1] = vb
                    auth_slots[i + 1] = vs
                    auth_src[i + 1] = ("reprobe", i + 1, 0)
                    matched = True
                    progressed = True
            if not matched:
                failed.append((i + 1, eb, es))
                break
            i += 1
        if all(ab is not None for ab in auth_bits):
            break
        if not failed:
            if not progressed:
                return fallback()
            continue
        # Batched re-probe of failed links from their true states.
        sbit = start_bit.copy()
        sslot = start_slot.copy()
        nb = np.zeros(L, np.int32)  # all lanes dead by default
        stop = stop_l.copy()
        for (ch, eb, es) in failed:
            lane = ch * bpm  # reuse the phase-0 lane slot for chunk ch
            rel = eb - chunk_start_abs[ch]
            if rel < 0 or rel >= int(win_bits[ch]):
                return fallback()
            sbit[lane] = rel
            sslot[lane] = es
            nb[lane] = win_bits[ch]
        meta_r = run_probe(sbit, sslot, nb, stop, max_steps)
        for (ch, eb, es) in failed:
            reprobe_meta[ch] = meta_r[ch * bpm]
            reprobe_start[ch] = (eb, es)
    if any(ab is None for ab in auth_bits):
        return fallback()

    # ---- final authoritative decode ------------------------------------
    # Span of chunk i: boundaries up to (excluding) its stop boundary.
    nblk = np.zeros(S_pad, np.int64)
    for i in range(S):
        stop_abs = chunk_start_abs[i] + int(chunk_bits[i])
        # all chunks: blocks strictly before the first boundary >= stop
        nblk[i] = int(np.searchsorted(auth_bits[i], stop_abs))
    # Junk trailing blocks (padding bits decoding as symbols) are capped
    # at the geometry's expected count (decoder.c:339-347 NULL blocks).
    g0 = np.cumsum(nblk) - nblk
    total_avail = int(g0[-1] + nblk[-1])

    f_start = np.zeros(S_pad, np.int32)
    f_slot = np.zeros(S_pad, np.int32)
    for i in range(S):
        f_start[i] = auth_bits[i][0] - chunk_start_abs[i]
        f_slot[i] = auth_slots[i][0]
    f_nbits = win_bits.astype(np.int32)
    # A final lane decodes only its authoritative span (~one chunk of
    # symbols); starvation retries cover outliers.
    steps = int(cb * 8 // 5 + 96)
    while True:
        coeffs, dc_final, starved = _final_decode(
            plan, jw, jnp.asarray(np.arange(S_pad, dtype=np.int32)),
            jnp.asarray(f_nbits), jnp.asarray(f_start),
            jnp.asarray(f_slot), jnp.asarray(g0.astype(np.int32)),
            jnp.asarray(nblk.astype(np.int32)), steps, total_blocks,
        )
        if not bool(np.asarray(starved)) or steps >= hard_steps:
            break
        steps = min(hard_steps, steps * 3 // 2)
    coeffs = np.array(coeffs)  # writable copy (DC fixup below)
    dc_final = np.asarray(dc_final)  # [C, S] per-lane DC totals

    # ---- DC prefix over chunks + placement into planes -----------------
    n_use = min(total_avail, total_blocks)
    dc_base = np.cumsum(dc_final, axis=1) - dc_final  # exclusive, [C, S]
    gi = np.arange(n_use)
    lane_of = np.searchsorted(g0, gi, side="right") - 1
    mcu = gi // bpm
    slot = gi % bpm
    comp = plan.slot_comp[slot]
    coeffs[gi, 0] += dc_base[comp, lane_of]

    # Global block ordinal -> plane row (decoder.c:319-358 block walk).
    if plan.interleaved:
        my = mcu // plan.m_x
        mx = mcu % plan.m_x
        seq = (
            (my * plan.slot_V[slot] + plan.slot_v[slot]) * plan.slot_bx[slot]
            + mx * plan.slot_H[slot]
            + plan.slot_h[slot]
        )
    else:
        seq = mcu * bpm + plan.slot_h[slot]
    ok = seq < plan.slot_nblocks[slot]
    rows = plan.slot_plane_offset[slot] + seq
    comp_ids = list(info.component_ids)
    stack = np.zeros((total_blocks, 64), np.int32)
    stack[rows[ok]] = coeffs[gi[ok]]
    off = 0
    for cid in comp_ids:
        nb_c = geom.by_id(cid).n_blocks
        planes[cid][:] = stack[off : off + nb_c]
        off += nb_c
    return n_use // bpm


def decode_scan_speculative(
    geom: FrameGeometry,
    info: ScanInfo,
    tables: Dict[Tuple[int, int], HuffTable],
    segments,
    planes: Dict[int, np.ndarray],
    lanes: int = 128,
) -> int:
    """Scan-level wrapper: speculative decode per ECS segment (streams
    WITH restart markers should use the restart engines instead)."""
    count = 0
    for seg in segments:
        count += decode_scan_speculative_jax(
            geom, info, tables, np.asarray(seg, np.uint8), planes,
            lanes=lanes,
        )
    return count
