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

import os
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
    counts = (meta > 0).sum(axis=1)
    return meta, counts, carry[1]


@partial(jax.jit, static_argnames=("plan", "max_steps", "total_blocks"))
def _final_decode(plan: ScanPlan, words, chunk_of_lane, nbits, start_bit,
                  start_slot, g0, nblk, max_steps: int, total_blocks: int):
    """Authoritative re-decode: lane i emits its nblk[i] blocks; the
    global block ordinal g0[i]+blk resolves straight to the PLANE row
    (the decoder.c:319-358 block walk, same affine form as
    lockstep_jax._place_emissions), so the output drops directly into
    the concatenated-planes layout.  DC values are lane-local cumulative
    (predictors start at 0); the caller adds the per-lane per-component
    prefix (decoder.c:350-355 chain, prefix-summed over chunks).
    Returns (coeffs [total_blocks, 64] in PLANE order, dc_final [C, L],
    starved)."""
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
    bpm = plan.blocks_per_mcu
    mcu = gblk // bpm
    slot = gblk - mcu * bpm
    if plan.interleaved:
        c0 = (plan.slot_plane_offset + plan.slot_v * plan.slot_bx
              + plan.slot_h).astype(np.int64)
        c1 = (plan.slot_V * plan.slot_bx).astype(np.int64)
        c2 = plan.slot_H.astype(np.int64)
    else:
        c0 = (plan.slot_plane_offset + plan.slot_h).astype(np.int64)
        c1 = c2 = None
    nb_t = plan.slot_nblocks.astype(np.int64)
    po_t = plan.slot_plane_offset.astype(np.int64)

    def slotc(col):
        out = jnp.full_like(slot, int(col[0]))
        for s in range(1, bpm):
            out = jnp.where(slot == s, int(col[s]), out)
        return out

    if plan.interleaved:
        my = mcu // plan.m_x
        mx = mcu - my * plan.m_x
        row = my * slotc(c1) + mx * slotc(c2) + slotc(c0)
        seq = row - slotc(po_t)
    else:
        seq = mcu * bpm + slotc(c0 - po_t)
        row = seq + slotc(po_t)
    good = (em_key > 0) & (seq < slotc(nb_t))
    oob = total_blocks * 64
    flat = jnp.where(good, row * 64 + pos, oob).reshape(-1)
    out = jnp.zeros(total_blocks * 64, jnp.int32)
    # write-once slots: scatter-set beats scatter-add ~1.5x on v5e
    out = out.at[flat].set(em_val.reshape(-1), mode="drop")
    dc_final = jnp.stack(carry[5])  # [C, L]
    # Any still-alive lane needs at least one more step to die (and
    # flush its pending DC emission) -- retry on that, not just on
    # unfinished spans.
    starved = carry[1].any()
    return out.reshape(total_blocks, 64), dc_final, starved


def _unpack_meta(meta_row: np.ndarray):
    """[(abs handled by caller)] -> (rel_bits, slots) of valid records."""
    v = meta_row[meta_row > 0] - 1
    return (v >> 4).astype(np.int64), (v & 15).astype(np.int64)


def _speculative_core(
    geom: FrameGeometry,
    info: ScanInfo,
    tables: Dict[Tuple[int, int], HuffTable],
    segment: np.ndarray,  # one unstuffed ECS (uint8)
    lanes: int = 128,
    max_rounds: int = 12,
):
    """Probe + resolve + final decode of one RST-less ECS.

    Returns (coeffs [total_blocks, 64] DEVICE-resident, plane order,
    DC already fixed up, n_use) -- or None when the stream defeats
    resolution (caller falls back to the serial oracle).
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

    def fallback(why=""):
        # Silent de-parallelization must be observable: count every
        # fallback (with its reason) in the default metrics so `-v` /
        # metrics output reveals a stream that quietly went serial.
        from ..utils.metrics import default_metrics

        default_metrics.count("speculative.fallbacks")
        default_metrics.count(
            f"speculative.fallback[{why.split(':')[0] or 'unknown'}]"
        )
        if os.environ.get("JPEG_TPU_SPEC_DEBUG"):
            print(f"[speculative] fallback: {why}", flush=True)
        return None

    # Chunking: >=1 KiB per chunk so probe step counts stay bounded.
    # The chunk size is quantized to powers of two so the jitted probe /
    # final-decode shapes recur across streams (jit cache reuse).
    S = int(min(lanes, max(1, n // 1024)))
    if S < 4 or bpm > 16:
        return fallback(f"too small / bpm: S={S} bpm={bpm}")
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

    # Probe round 0: bpm phase variants per chunk (padded chunks are
    # dead lanes: win_bits=0).
    L = S_pad * bpm
    chunk_of_lane = np.repeat(np.arange(S_pad, dtype=np.int32), bpm)
    start_slot = np.tile(np.arange(bpm, dtype=np.int32), S_pad)
    start_bit = np.zeros(L, np.int32)
    nbits_l = win_bits[chunk_of_lane].astype(np.int32)
    # Lanes decode their FULL 2-chunk window: the overlap into the next
    # chunk is where the authoritative track meets the successor's
    # speculative track (sync needs tens of symbols of common ground --
    # the first boundary past the chunk edge is NOT enough).
    stop_l = nbits_l
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

    def run_probe(sbit, sslot, nb, stop, steps, retries=2):
        # Only tiny (counts, alive) vectors come back per attempt; the
        # meta matrix downloads ONCE, sliced to the live column count
        # (this path rides the host link).  Junk phase variants can stay
        # starved forever, so retries are capped -- a starved TRUE lane
        # surfaces as a failed link and the reprobe machinery covers it.
        nonlocal maxb
        while True:
            meta, counts, alive = _probe(
                plan, jw, jcl, jnp.asarray(nb), jnp.asarray(sbit),
                jnp.asarray(sslot), jnp.asarray(stop), steps, maxb,
            )
            counts_h = np.asarray(counts)
            saturated = bool((counts_h >= maxb).any())
            if saturated and maxb < maxb_hard:
                maxb = min(maxb_hard, maxb * 2)
                continue
            starved = bool(np.asarray(alive).any())
            if not starved or retries <= 0 or steps >= hard_steps:
                cmax = max(1, int(counts_h.max()))
                return np.asarray(meta[:, :cmax])
            retries -= 1
            steps = min(hard_steps, steps * 3 // 2)

    meta0 = run_probe(start_bit, start_slot, nbits_l, stop_l, max_steps)

    # ---- resolution (host; data is [S*bpm, maxb] i32) ------------------
    # Authoritative per chunk i: its boundary list from its sync point
    # through its window (chunks i and i+1).  A link to chunk i+1 holds
    # at the EARLIEST state (bit, slot) that chunk i's authoritative
    # overlap and ANY phase variant of chunk i+1 both visited -- from a
    # common state the decodes are identical (same bits, same tables),
    # so everything after is authoritative.
    auth_pack = [None] * S  # packed (bit<<4 | slot), ascending
    auth_sync = [0] * S  # index of the chunk's sync boundary in its list
    chunk_start_abs = starts * 8

    def packed_of(meta_row, chunk):
        v = meta_row[meta_row > 0].astype(np.int64) - 1
        return v + (chunk_start_abs[chunk] << 4)

    p0 = packed_of(meta0[0], 0)
    if p0.size == 0 or p0[0] != 0:
        return fallback(f"lane0 start: {p0[:1]}")
    auth_pack[0] = p0

    reprobe_meta: Dict[int, np.ndarray] = {}
    reprobe_from: Dict[int, int] = {}  # chunk -> packed start state

    for rnd in range(max_rounds):
        progressed = False
        failed: list = []
        i = 0
        while i < S - 1:
            if auth_pack[i] is None:
                break
            if auth_pack[i + 1] is not None:
                i += 1
                continue
            nxt_start = chunk_start_abs[i + 1] << 4
            tail = auth_pack[i][auth_pack[i] >= nxt_start]
            if tail.size == 0:
                return fallback(
                    f"chunk {i} has no boundaries past the chunk edge "
                    f"(n={auth_pack[i].size})"
                )
            best = None
            best_src = None
            for variant in range(bpm):
                vp = packed_of(meta0[(i + 1) * bpm + variant], i + 1)
                common = np.intersect1d(tail, vp, assume_unique=False)
                if common.size and (best is None or common[0] < best):
                    best = int(common[0])
                    best_src = vp
            if (i + 1) in reprobe_meta:
                rp = packed_of(reprobe_meta[i + 1], i + 1)
                if rp.size and int(rp[0]) == reprobe_from[i + 1] and (
                    best is None or rp[0] <= best
                ):
                    best = int(rp[0])
                    best_src = rp
            if best is None:
                failed.append((i + 1, int(tail[0])))
                break
            # Truncate chunk i's span at the handoff, adopt chunk i+1.
            auth_pack[i] = auth_pack[i][auth_pack[i] < best]
            k = int(np.searchsorted(best_src, best))
            auth_pack[i + 1] = best_src[k:]
            progressed = True
            i += 1
        if all(ap is not None for ap in auth_pack):
            break
        if not failed:
            if not progressed:
                return fallback(f"round {rnd}: no progress, none failed")
            continue
        # Batched re-probe of failed links from their true states (the
        # earliest boundary of the predecessor inside the failed chunk).
        sbit = start_bit.copy()
        sslot = start_slot.copy()
        nb = np.zeros(L, np.int32)  # all lanes dead by default
        for (ch, hand) in failed:
            lane = ch * bpm  # reuse the phase-0 lane slot for chunk ch
            rel = (hand >> 4) - chunk_start_abs[ch]
            if rel < 0 or rel >= int(win_bits[ch]):
                return fallback(
                    f"handoff out of window: chunk {ch} rel={rel}"
                )
            sbit[lane] = rel
            sslot[lane] = hand & 15
            nb[lane] = win_bits[ch]
        meta_r = run_probe(sbit, sslot, nb, nb, max_steps)
        for (ch, hand) in failed:
            reprobe_meta[ch] = meta_r[ch * bpm]
            reprobe_from[ch] = hand
    if any(ap is None for ap in auth_pack):
        unresolved = [i for i, ap in enumerate(auth_pack) if ap is None]
        return fallback(
            f"unresolved after {max_rounds} rounds: {unresolved[:6]}..."
        )

    # ---- final authoritative decode ------------------------------------
    # Chunk i's span was truncated at the next chunk's handoff during
    # resolution, so its block count is just its list length.  Junk
    # trailing blocks (padding bits decoding as symbols) are capped at
    # the geometry's expected count later (decoder.c:339-347 NULL
    # blocks).
    nblk = np.zeros(S_pad, np.int64)
    f_start = np.zeros(S_pad, np.int32)
    f_slot = np.zeros(S_pad, np.int32)
    for i in range(S):
        nblk[i] = auth_pack[i].size
        f_start[i] = (auth_pack[i][0] >> 4) - chunk_start_abs[i]
        f_slot[i] = auth_pack[i][0] & 15
    g0 = np.cumsum(nblk) - nblk
    total_avail = int(g0[-1] + nblk[-1])
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
    # ---- DC prefix over chunks (fixup ON DEVICE, plane coords) ---------
    # Per-plane-row (lane, component) maps are tiny host arrays; the
    # cumulative-base gather + column add run on the device so the
    # coefficients never need to leave HBM (decode_frame_rstless).
    n_use = min(total_avail, total_blocks)
    gi = np.arange(n_use)
    lane_of = np.searchsorted(g0, gi, side="right") - 1
    mcu = gi // bpm
    slot = gi % bpm
    comp = plan.slot_comp[slot]
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
    lane_row = np.zeros(total_blocks, np.int32)
    comp_row = np.zeros(total_blocks, np.int32)
    mask_row = np.zeros(total_blocks, np.int32)
    lane_row[rows[ok]] = lane_of[ok]
    comp_row[rows[ok]] = comp[ok]
    mask_row[rows[ok]] = 1
    coeffs = _dc_fixup(
        coeffs, dc_final, jnp.asarray(lane_row), jnp.asarray(comp_row),
        jnp.asarray(mask_row),
    )
    return coeffs, n_use


@jax.jit
def _dc_fixup(coeffs, dc_final, lane_row, comp_row, mask_row):
    """Add the cross-chunk DC prefix to each decoded block's DC slot."""
    dc_base = jnp.cumsum(dc_final, axis=1) - dc_final  # [C, L] exclusive
    L = dc_final.shape[1]
    fix = jnp.take(
        dc_base.reshape(-1), comp_row * L + lane_row, mode="clip"
    ) * mask_row
    return coeffs.at[:, 0].add(fix)


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
    seg = np.asarray(segment, np.uint8)
    res = _speculative_core(geom, info, tables, seg, lanes, max_rounds)
    if res is None:
        from .serial import decode_scan_serial

        return decode_scan_serial(geom, info, tables, [seg], planes)
    coeffs_dev, n_use = res
    c = np.asarray(coeffs_dev)
    off = 0
    for cid in info.component_ids:
        nb_c = geom.by_id(cid).n_blocks
        planes[cid][:] = c[off : off + nb_c]
        off += nb_c
    from .lockstep_jax import _cached_plan

    plan = _cached_plan(
        geom, info, tuple(sorted((k, t.spec) for k, t in tables.items()))
    )
    return n_use // plan.blocks_per_mcu


def decode_scan_speculative(
    geom: FrameGeometry,
    info: ScanInfo,
    tables: Dict[Tuple[int, int], HuffTable],
    segments,
    planes: Dict[int, np.ndarray],
    lanes: int = 128,
    ri: int = 0,
) -> int:
    """Scan-level wrapper: speculative decode for RST-less scans.

    A scan WITH restart markers (more than one ECS segment) already has
    explicit synchronization points, so speculation buys nothing there;
    it routes to the restart-lane lockstep engine, which places each
    segment's blocks at its true frame offset.  (Decoding segments
    independently here would start each at block ordinal 0 and clobber
    the previous segment -- the round-2 advisor finding.)
    """
    if len(segments) > 1:
        from .lockstep_jax import decode_scan_lockstep_jax

        return decode_scan_lockstep_jax(
            geom, info, tables, list(segments), planes, ri=ri
        )
    count = 0
    for seg in segments:
        count += decode_scan_speculative_jax(
            geom, info, tables, np.asarray(seg, np.uint8), planes,
            lanes=lanes,
        )
    return count
