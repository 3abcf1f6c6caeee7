"""Speculative parallel decode of RST-less entropy streams.

The reference decodes any baseline ECS serially (read_ecs,
decoder.c:364-388; segment ends detected byte-by-byte in io.c:247-274).
With restart markers the stream is cut into independent lanes
(lockstep_jax); WITHOUT them the bitstream has no known entry points --
bit positions and the DC chain (decoder.c:350-355) are sequential.

This module is the "ring-attention analog" for that case (SURVEY §2.2
row 4; PAPERS.md GPU-decode recipe, arxiv 2111.09219): Huffman streams
self-synchronize, so a decoder started at a wrong position converges to
the true symbol boundaries after a short prefix.  Four phases, whose
heavy data stays on the device (round-3 redesign -- round 2 downloaded
an [L, ~3000] boundary matrix per frame over a ~25 MB/s link, which
dominated the runtime at ~0.2x the serial reference):

  PROBE   split the unstuffed stream into S byte-aligned chunks; for
          every chunk spawn ``bpm`` speculative lanes (one per possible
          intra-MCU phase -- the Huffman TABLE sequence depends on the
          slot, so bit convergence alone is not enough for interleaved
          color scans).  Each lane decodes its chunk plus a short
          overlap into the next, recording two compact block-boundary
          lists: HEAD records (boundaries in the lane's own first
          ``ov`` bytes -- where a successor's sync state must lie) and
          TAIL records (boundaries inside the overlap).
  MATCH   (device, same dispatch) every chunk's HEAD records scatter a
          per-chunk bit -> (head-ordinal, variant, slot) membership
          map; every lane walks its TAIL records and takes the FIRST
          one present in its successor's map with the same slot phase
          -- from a common (bit, slot) block-start state two decodes
          are identical, so everything after is authoritative.  Only an
          [L, 8] link-result table returns to the host.
  RESOLVE (host, tiny) authority chains from chunk 0 through the link
          results; missed links (slow-sync content, saturated record
          caps) re-probe from the now-known true state in batched
          rounds against the SAME device-resident maps, and a starved
          authoritative lane triggers one whole-probe retry at a larger
          step bound.
  FINAL   every chunk re-decodes exactly its authoritative span,
          emitting coefficients at their plane rows; per-chunk DC
          totals prefix-sum across chunks afterwards (decoder.c:350-355
          in the restart engines' shape), on device so the coefficients
          never leave HBM.

Frames of a Motion-JPEG stream batch: all frames' chunks ride ONE
probe/match dispatch and ONE final dispatch
(``_speculative_core_batch``), amortizing dispatch latency and the
device round trips across the whole stream.

Output is bit-identical to the serial oracle on valid streams; invalid
streams may deviate (documented contract, PARITY.md) and anything
unresolvable falls back to the serial oracle (counted in metrics).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import ZIGZAG
from ..geometry import FrameGeometry, ScanInfo
from ..tables import HuffTable
from .lockstep import ScanPlan, build_scan_plan

UNROLL = 8
CHAIN_WN_MAX = 320  # select-chain refill viable up to this row width
# Record capacities (scatter/gather cost in the match phase is ~7-10 ns
# per attempted element x L lanes x cap, so keep these tight):
# TCAP only needs the AUTHORITATIVE lane's sync-strip boundaries (true
# content, ~30-44 bits/block over <=2048 strip bits -> <=68).  HCAP must
# cover a variant's junk prefix through the whole strip: junk blocks are
# SHORT (~10-20 bits), so a 2048-bit strip can need ~100-200 head
# records -- a boundary past the cap is LOST from the membership map and
# every tail state landing there becomes a link miss (measured 105
# misses -> 4.7 cascading re-probe rounds per 8-frame 1080p batch at
# HCAP=128; the resolve loop, not the scans, then dominates the batch).
# Env knobs for hardware A/B; both feed jit static shapes.
TCAP = int(os.environ.get("JPEG_TPU_SPEC_TCAP", "48"))
HCAP = int(os.environ.get("JPEG_TPU_SPEC_HCAP", "128"))
BIGKEY = 1 << 20

# res[, :] columns returned by _probe_match
R_SIG, R_M, R_PAY, R_PRET, R_TAIL0, R_ALIVE, R_BLK, R_SU = range(8)

# Sticky learned step bounds per (plan identity, chunk bytes): [probe
# steps, final steps].  Plans are lru-cached singletons (see
# _cached_plan_of), so id() is a stable key for the process lifetime.
_learned_steps: Dict[Tuple[int, int], list] = {}

# Two-phase probe tuning: phase-A (merge-kill) step count and the sticky
# per-(plan, chunk-bytes) survivor-roster width.  KILL_STEPS covers the
# head region at junk rates (~1024 bits / ~3.5 bits-per-symbol) so merge
# queries have settled; kb starts at 2 (measured mean survivors ~1.5-2.5
# of bpm=6) and grows when a batch's recovery rows say the roster
# dropped live trajectories wholesale.
KILL_STEPS = 192
_learned_kb: Dict[Tuple[int, int], int] = {}

# Learned bounds feed jit STATIC arguments (scan trip counts), so every
# distinct value is a fresh XLA compile -- minutes on this toolchain.
# Narrowed bounds are therefore quantized to coarse buckets (and adopted
# only when they save at least a whole bucket), which makes the learned
# state reach a FIXED POINT after one post-warmup run: warm-to-fixed-
# point callers (mjpeg.warm_stream_device) loop until learned_snapshot()
# stops changing, and timed runs after that never recompile.
STEP_BUCKET = 512


def _narrow(default: int, observed: int, margin: int, floor: int) -> int:
    """Bucket-quantized narrowing of a static step bound: round the
    observed need (+margin) UP to a STEP_BUCKET multiple and adopt it
    only when that saves >= one full bucket vs the default -- otherwise
    keep the default so the jit key never churns for small wins."""
    cand = max(floor, -(-(observed + margin) // STEP_BUCKET) * STEP_BUCKET)
    return cand if cand <= default - STEP_BUCKET else default


def learned_snapshot():
    """Hashable snapshot of every sticky learned value that feeds a jit
    STATIC argument (probe/final step bounds, survivor-roster width).
    Two equal snapshots around a decode mean the decode compiled nothing
    new from learning -- the warm-to-fixed-point loop's stop test."""
    return (
        tuple(sorted((k, tuple(v)) for k, v in _learned_steps.items())),
        tuple(sorted(_learned_kb.items())),
    )


def _spec_step(plan: ScanPlan, consts, carry):
    """One Huffman symbol on every speculative lane.

    Shares the scalarized math of lockstep_jax._symbol_step_scalar
    (huffman.c:193-271 semantics).  The window refills either by a flat
    gather (large chunk windows) or by the restart engine's row-select
    chain (small windows -- ~20x cheaper per step, the production
    shape).  The MCU counter is replaced by a local block ordinal
    ``blk``; block starts emit boundary records into two compact
    per-lane-indexed streams (head/tail); lanes stop AT the first
    boundary >= stop_bit without consuming bits (io.c:247-274 ECS-end
    analog: the boundary itself is the handoff state).
    """
    (refill, nbits, stop_bit, nblk_cap, cb_bits, ov_bits,
     hv_cols, iota_hv) = consts
    (bitpos, alive, blk, slot, coeff, dc_pred, cur_diff,
     w0, w1, pend_key, pend_val, tail_i, head_i, pre_tail,
     lh_rec, lh_blk, su) = carry
    su = su + alive.astype(jnp.int32)  # consumed-step count (the
    #   observed-need signal for the sticky learned step bounds)
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
    at_start = alive & is_dc
    stop_here = at_start & (bitpos >= stop_bit)
    is_tail = at_start & (bitpos >= cb_bits)
    is_head = at_start & (bitpos < ov_bits)
    rec = ((bitpos << 4) | slot) + 1
    rec_key = jnp.where(
        is_tail & (tail_i < TCAP),
        tail_i,
        jnp.where(is_head & (head_i < HCAP), TCAP + head_i, BIGKEY),
    )
    rec_val = rec
    pre_tail = jnp.where(is_tail & (tail_i == 0), blk, pre_tail)
    # last CAPPED head record + its block ordinal: the merge-kill query
    # state (a state present in the vm map, so `p > mine` is decisive)
    cap_head = is_head & (head_i < HCAP)
    lh_rec = jnp.where(cap_head, rec, lh_rec)
    lh_blk = jnp.where(cap_head, blk, lh_blk)
    tail_i = tail_i + is_tail
    head_i = head_i + is_head

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

    # value = huffval[tab, vidx] via a packed-word select chain (pure
    # [L]-shaped ops fusing into the step's elementwise pass; see
    # lockstep_jax for the measured rationale).
    wpt = iota_hv.shape[1] // 4
    widx_v = tab * wpt + (vidx >> 2)
    packed = jnp.zeros_like(vidx)
    for j, w in enumerate(hv_cols):
        if w:
            packed = jnp.where(widx_v == j, w, packed)
    value = (packed >> ((vidx & 3) * 8)) & 255

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

    # ---- window refill: at most one 32-bit boundary per symbol ---------
    # "none": the macro-step wrapper (chain mode) carries a 5-word
    # window and feeds w0/w1 per inner step -- the per-step refill here
    # would re-read the whole [wn, L] matrix from HBM (measured as the
    # probe scan's dominant cost, ~12 MB/step at the 8-frame shape).
    if refill[0] != "none":
        widx_new = bitpos >> 5
        crossed = live & (widx_new != ((bitpos - need) >> 5))
        tgt = widx_new + 1
        words_flat, row_of_lane, wn = refill[1:]
        idx = row_of_lane * wn + jnp.clip(tgt, 0, wn - 1)
        fetched = jnp.take(words_flat, idx, mode="clip")
        w0 = jnp.where(crossed, w1, w0)
        w1 = jnp.where(crossed, fetched, w1)

    carry = (bitpos, alive, blk, slot, coeff, dc_pred, cur_diff,
             w0, w1, pend_key, pend_val, tail_i, head_i, pre_tail,
             lh_rec, lh_blk, su)
    return carry, (em_key, em_val, rec_key, rec_val)


NW = 9  # carried window words in chain mode (>= INNER + 1)
INNER = 8  # symbol steps per matrix refill


def _chain_scan(plan, consts, words_t, start_bit, start_slot, nbits,
                max_steps: int, carry0=None):
    """Macro-step scan for chain mode: carry a 5-word (160-bit) window
    per lane and decode INNER symbols per refill, so the [wn, L] window
    matrix is read from HBM once per INNER steps instead of every step.

    Invariant: a symbol consumes <= 32 bits, so after a refill sets
    wbase = bitpos >> 5 (offset < 32), inner step k reads window words
    <= k + 1 <= NW - 1.  ``carry0`` continues a previous scan's state
    (two-phase probe); the window words re-fetch from THIS words_t.
    Returns (final state carry, ys tuple of
    [ceil(max_steps/INNER)*INNER, L] arrays).
    """
    L = start_bit.shape[0]
    z = jnp.zeros_like(start_bit)

    def fetch(wb):
        ws = [jnp.zeros(L, jnp.uint32) for _ in range(NW)]
        for r_i in range(words_t.shape[0]):
            row = words_t[r_i]
            for jj in range(NW):
                ws[jj] = jnp.where(wb + jj == r_i, row, ws[jj])
        return tuple(ws)

    if carry0 is None:
        carry0 = (
            start_bit, start_bit < nbits, z, start_slot, z,
            tuple(z for _ in range(plan.n_comps)), z,
            jnp.zeros(L, jnp.uint32), jnp.zeros(L, jnp.uint32),
            z, z, z, z, z, z, z, z,
        )
    wb0 = carry0[0] >> 5

    def macro(carry_all, _):
        carry, w5, wb = carry_all
        ems = []
        for _k in range(INNER):
            bitpos = carry[0]
            j = (bitpos >> 5) - wb  # in [0, NW-2] by the invariant
            w0 = w5[0]
            for i in range(1, NW):
                w0 = jnp.where(j == i, w5[i], w0)
            w1 = w5[1]
            for i in range(2, NW):
                w1 = jnp.where(j + 1 == i, w5[i], w1)
            carry = carry[:7] + (w0, w1) + carry[9:]
            carry, em = _spec_step(plan, consts, carry)
            ems.append(em)
        wb2 = carry[0] >> 5
        return (carry, fetch(wb2), wb2), tuple(
            jnp.stack([e[i] for e in ems]) for i in range(4)
        )

    # unroll=1: the INNER symbol steps already amortize the loop
    # overhead, and the macro body is large enough that further
    # unrolling mostly inflates compile time (minutes per shape on the
    # CPU test tier).
    macros = -(-max_steps // INNER)
    (carry, _, _), ys = jax.lax.scan(
        macro, (carry0, fetch(wb0), wb0), None, length=macros, unroll=1
    )
    ys = tuple(y.reshape(-1, L) for y in ys)
    return carry, ys


def _hv_consts(plan: ScanPlan):
    """Packed huffval constants (see lockstep_jax._hv_consts): a host
    tuple of T*vpad/4 int32 words, 4 table bytes each -- the lookup is
    then a pure [L]-shaped select chain that fuses into the step."""
    from .lockstep_jax import _hv_consts as _lk

    return _lk(plan)


def _row_select(words_flat, row_of_lane, wn, tgt):
    idx = row_of_lane * wn + jnp.clip(tgt, 0, wn - 1)
    return jnp.take(words_flat, idx, mode="clip")


def _init_carry(plan, refill, start_bit, start_slot, nbits):
    z = jnp.zeros_like(start_bit)
    widx = start_bit >> 5
    if refill[0] == "chain":
        words_t = refill[1]
        w0 = jnp.zeros(start_bit.shape, jnp.uint32)
        w1 = jnp.zeros(start_bit.shape, jnp.uint32)
        for j in range(words_t.shape[0]):
            w0 = jnp.where(widx == j, words_t[j], w0)
            w1 = jnp.where(widx + 1 == j, words_t[j], w1)
    else:
        words_flat, row_of_lane, wn = refill[1:]
        w0 = _row_select(words_flat, row_of_lane, wn, widx)
        w1 = _row_select(words_flat, row_of_lane, wn, widx + 1)
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
        z,  # tail_i
        z,  # head_i
        z,  # pre_tail
        z,  # lh_rec (last capped head record)
        z,  # lh_blk (its block ordinal)
        z,  # su (consumed steps)
    )


def _lane_matrix(words, reps: int):
    """[R, wn] chunk windows -> [R*reps, wn] per-lane rows via broadcast
    (the canonical lane layout repeats each row ``reps`` times; a gather
    would cost ~10 ns/element)."""
    if reps <= 1:
        return words
    R, wn = words.shape
    return jnp.broadcast_to(words[:, None, :], (R, reps, wn)).reshape(
        R * reps, wn
    )


def _refill_arg(plan, words, row_of_lane, chain: bool, reps: int = 1):
    """words: [R, wn] window rows; lane l reads row row_of_lane[l].

    ``reps`` > 1 asserts the canonical lane layout (row_of_lane =
    repeat(arange(R), reps)), letting the per-lane matrix build as a
    BROADCAST+reshape (a free XLA copy) instead of a [L, wn] gather
    (~10 ns/element -- 30 ms at the 8-frame batch shape)."""
    if chain:
        if reps > 1:
            R, wn = words.shape
            wl = jnp.broadcast_to(
                words[:, None, :], (R, reps, wn)
            ).reshape(R * reps, wn)
        else:
            wl = words
        return ("chain", wl.T)
    return ("gather", words.reshape(-1), row_of_lane, words.shape[1])


def _compact_records(rkey, rval):
    """[steps, L] sparse per-step records -> per-lane [L, TCAP+HCAP].

    Keys are unique per lane (tail 0..TCAP-1, head TCAP..TCAP+HCAP-1)
    and ascend along the step axis, so ONE sort compacts both lists
    with tail records leading."""
    L = rkey.shape[1]
    k_t = jnp.where(rval > 0, rkey, BIGKEY).T  # [L, steps]
    keys_s, recs_s = jax.lax.sort((k_t, rval.T), dimension=1, num_keys=1)
    take = min(TCAP + HCAP, recs_s.shape[1])
    recs = jnp.zeros((L, TCAP + HCAP), jnp.int32).at[:, :take].set(
        recs_s[:, :take]
    )
    keys = jnp.full((L, TCAP + HCAP), BIGKEY, jnp.int32).at[:, :take].set(
        keys_s[:, :take]
    )
    return keys, recs


def _scatter_heads(vm_in, keys, recs, row_of_lane, variant, ov_bits,
                   s_rows):
    """HEAD records -> vm[own_row, bit] membership map (scatter-max).

    Payload packs (head ordinal, variant, slot) + 1; head records are a
    lane's first records, so head ordinal == blk ordinal."""
    bit_f = (recs - 1) >> 4
    slot_f = (recs - 1) & 15
    is_head = (keys >= TCAP) & (keys < TCAP + HCAP)
    head_idx = keys - TCAP
    payload = ((head_idx << 8) | (variant[:, None] << 4) | slot_f) + 1
    own = row_of_lane[:, None] * ov_bits + jnp.clip(bit_f, 0, ov_bits - 1)
    oob = s_rows * ov_bits
    return vm_in.at[jnp.where(is_head, own, oob).reshape(-1)].max(
        jnp.where(is_head, payload, 0).reshape(-1), mode="drop"
    )


def _tail_walk(keys, recs, vm, succ_row, pre_tail, cb_bits, ov_bits):
    """First tail record present in the successor's membership map.

    Sorted keys put every tail record in the leading TCAP columns, so
    the walk's vm gather touches only [L, TCAP] elements.  Ordinals come
    from the KEY, not the column index: a phase-B record list starts at
    the carried tail index, so column i's ordinal is pre_tail + key_i.
    Returns (found, sig, m, pay, tail0, pret)."""
    kT = keys[:, :TCAP]
    rT = recs[:, :TCAP]
    bit_t = (rT - 1) >> 4
    slot_t = (rT - 1) & 15
    is_tail = kT < TCAP
    rel2 = bit_t - cb_bits
    ok_pos = (rel2 >= 0) & (rel2 < ov_bits)
    look_idx = succ_row[:, None] * ov_bits + jnp.clip(rel2, 0, ov_bits - 1)
    look = jnp.take(
        vm, jnp.where(is_tail & ok_pos, look_idx, 0), mode="clip"
    )
    hit = (
        is_tail & ok_pos & (succ_row[:, None] >= 0) & (look > 0)
        & (((look - 1) & 15) == slot_t)
    )
    col = jax.lax.broadcasted_iota(jnp.int32, hit.shape, 1)
    first = jnp.min(jnp.where(hit, col, TCAP), axis=1)
    found = first < TCAP
    pick = col == first[:, None]

    def sel(x):
        return jnp.where(pick & hit, x, 0).sum(axis=1)

    sig = sel((rel2 << 4) | slot_t)
    m = pre_tail + jnp.where(found, sel(kT), 0)
    pay = sel(look - 1)
    has_t0 = keys[:, 0] < TCAP
    tail0 = jnp.where(has_t0, recs[:, 0], 0)
    pret = pre_tail + jnp.where(has_t0, keys[:, 0], 0)
    return found, sig, m, pay, tail0, pret


def _pack_res(found, sig, m, pay, pret, tail0, alive, blk, su):
    return jnp.stack(
        [
            jnp.where(found, sig + 1, 0),
            jnp.where(found, m, 0),
            pay,
            pret,
            tail0,
            alive,
            blk,
            su,
        ],
        axis=1,
    )


@partial(jax.jit, static_argnames=("plan", "max_steps", "chain", "s_rows",
                                   "ov_bits", "cb_bits", "reps",
                                   "write_vm", "kill_steps", "kb"))
def _probe_match(plan: ScanPlan, words, row_of_lane, succ_row, variant,
                 nbits, start_bit, start_slot, vm_in, max_steps: int,
                 chain: bool, s_rows: int, ov_bits: int, cb_bits: int,
                 reps: int = 1, write_vm: bool = True,
                 kill_steps: int = 0, kb: int = 0):
    """Probe + record compaction + device link-match in ONE dispatch.

    Returns (res [L, 8] int32, vm [s_rows * ov_bits]).  res columns:
    sig+1|0 (matched sync state, (rel2<<4|slot)), m (blk ordinal of the
    matched tail record), payload (successor head ordinal/variant/slot),
    pre_tail (blk ordinal of tail record 0), tail0 (its packed record),
    alive (0 done, 1 starved, 2 roster-dropped/incomplete), blk_final
    (total blocks decoded).  ``vm_in`` lets re-probe rounds extend the
    existing membership maps (re-probes pass write_vm=False: their
    variant-0-tagged records would make match payloads ambiguous).

    kill_steps > 0 with 0 < kb < reps enables the TWO-PHASE probe: after
    ``kill_steps`` all L = rows x reps phase-variant lanes stop; lanes
    whose trajectories provably merged with a peer (their last recorded
    head state lost the vm scatter-max to another lane -- from a common
    (bit, slot) state two decodes are identical) or already died are
    retired, and only the first ``kb`` live lanes per row continue
    through the remaining window.  Survivor counts on real content are
    ~1.5-2.5 of bpm=6 (see docs/ARCHITECTURE.md), so most of the
    window's decode work runs on a quarter of the lanes.  Merged lanes'
    results are synthesized from their representative (ordinals shifted
    by the block-count delta at the merge state); rank-overflow lanes
    report alive=2 and resolve via the recovery re-probe round.
    """
    L = start_bit.shape[0]
    hv_cols, iota_hv = _hv_consts(plan)
    two_phase = (
        kill_steps > 0 and 0 < kb < reps and write_vm
        and kill_steps < max_steps
    )

    def run(steps_n, words_r, reps_r, rows_r, nb, sbit, sslot, carry0):
        """One scan leg; words_r is the [rows, wn] window matrix and the
        lane layout is canonical (row-major, reps_r lanes per row)."""
        if chain:
            consts = (("none",), nb, nb, jnp.int32(1 << 29),
                      jnp.int32(cb_bits), jnp.int32(ov_bits),
                      hv_cols, iota_hv)
            words_t = _lane_matrix(words_r, reps_r).T
            carry, ys = _chain_scan(
                plan, consts, words_t, sbit, sslot, nb, steps_n, carry0
            )
            return carry, ys[2], ys[3]
        refill = ("gather", words_r.reshape(-1), rows_r, words_r.shape[1])
        consts = (refill, nb, nb, jnp.int32(1 << 29),
                  jnp.int32(cb_bits), jnp.int32(ov_bits),
                  hv_cols, iota_hv)
        init = (
            carry0 if carry0 is not None
            else _init_carry(plan, refill, sbit, sslot, nb)
        )

        def step(c, _):
            c, (_, _, rk, rv) = _spec_step(plan, consts, c)
            return c, (rk, rv)

        carry, (rkey, rval) = jax.lax.scan(
            step, init, None, length=steps_n, unroll=UNROLL
        )
        return carry, rkey, rval

    if not two_phase:
        carry, rkey, rval = run(
            max_steps, words, reps, row_of_lane, nbits, start_bit,
            start_slot, None,
        )
        keys, recs = _compact_records(rkey, rval)
        vm = (
            _scatter_heads(vm_in, keys, recs, row_of_lane, variant,
                           ov_bits, s_rows)
            if write_vm else vm_in
        )
        found, sig, m, pay, tail0, pret = _tail_walk(
            keys, recs, vm, succ_row, carry[13], cb_bits, ov_bits
        )
        res = _pack_res(found, sig, m, pay, pret, tail0,
                        carry[1].astype(jnp.int32), carry[2], carry[16])
        return res, vm

    # ---- phase A: every variant lane decodes the head region ----------
    carryA, rkA, rvA = run(
        kill_steps, words, reps, row_of_lane, nbits, start_bit,
        start_slot, None,
    )
    keysA, recsA = _compact_records(rkA, rvA)
    vm = _scatter_heads(vm_in, keysA, recsA, row_of_lane, variant,
                        ov_bits, s_rows)

    # ---- merge kill: losing the scatter-max at my last head state ------
    # means a peer lane visited it; from a shared state two decodes are
    # identical, so my future records are the winner's (ordinals shifted
    # by our block-count difference at that state).
    lh_rec, lh_blk = carryA[14], carryA[15]
    bit_l = (lh_rec - 1) >> 4
    slot_l = (lh_rec - 1) & 15
    mine = ((lh_blk << 8) | (variant << 4) | slot_l) + 1
    own_idx = row_of_lane * ov_bits + jnp.clip(bit_l, 0, ov_bits - 1)
    p = jnp.take(vm, jnp.where(lh_rec > 0, own_idx, 0), mode="clip")
    # the winner must be at the SAME (bit, slot) state: a different-slot
    # lane at the same bit is a different decode state (its win also
    # masks any same-slot record, which is a safe under-merge)
    merged = (lh_rec > 0) & (p > mine) & (((p - 1) & 15) == slot_l)
    rep_var = ((p - 1) >> 4) & 15
    delta = lh_blk - ((p - 1) >> 8)
    aliveA = carryA[1]
    live = aliveA & ~merged

    # ---- roster: first kb live variants per row -----------------------
    R2 = L // reps
    live_rb = live.reshape(R2, reps)
    ex_rank = jnp.cumsum(live_rb.astype(jnp.int32), axis=1) \
        - live_rb.astype(jnp.int32)
    keep = live_rb & (ex_rank < kb)
    cols = []
    for j in range(kb):
        vj = jnp.zeros((R2,), jnp.int32)
        for v in range(reps - 1, -1, -1):
            vj = jnp.where(keep[:, v] & (ex_rank[:, v] == j), v, vj)
        cols.append(vj)
    vsel = jnp.stack(cols, axis=1)  # [R2, kb] variant of each slot
    cnt = live_rb.sum(axis=1)
    slot_valid = jnp.arange(kb, dtype=jnp.int32)[None, :] < cnt[:, None]
    take_l = (
        jnp.arange(R2, dtype=jnp.int32)[:, None] * reps + vsel
    ).reshape(-1)
    dropped = (live_rb & (ex_rank >= kb)).reshape(-1)

    def g(x):
        return jnp.take(x, take_l, axis=0)

    cB = []
    for el in carryA:
        cB.append(tuple(g(e) for e in el) if isinstance(el, tuple)
                  else g(el))
    cB[1] = cB[1] & slot_valid.reshape(-1)
    carryB0 = tuple(cB)
    rowB = jnp.repeat(jnp.arange(R2, dtype=jnp.int32), kb)
    succB = g(succ_row)
    varB = g(variant)
    nbB = g(nbits)

    # ---- phase B: survivors finish the window -------------------------
    carryB, rkB, rvB = run(
        max_steps - kill_steps, words, kb, rowB, nbB, carryB0[0],
        carryB0[3], carryB0,
    )
    keysB, recsB = _compact_records(rkB, rvB)
    vm = _scatter_heads(vm, keysB, recsB, rowB, varB, ov_bits, s_rows)

    # ---- walks over both record sets (vm now complete) ----------------
    fA, sigA, mA, payA, t0A, prA = _tail_walk(
        keysA, recsA, vm, succ_row, carryA[13], cb_bits, ov_bits
    )
    fB, sigB, mB, payB, t0B, prB = _tail_walk(
        keysB, recsB, vm, succB, carryB[13], cb_bits, ov_bits
    )

    # ---- res assembly: A results for every lane... --------------------
    res = _pack_res(fA, sigA, mA, payA, prA, t0A,
                    aliveA.astype(jnp.int32), carryA[2], carryA[16])
    # rank-overflow lanes are incomplete unless the A walk already hit
    res = res.at[:, R_ALIVE].set(
        jnp.where(dropped & ~fA, 2, res[:, R_ALIVE])
    )
    # ...survivors overwrite with the A-priority combination of both sets
    fAg = g(fA)
    t0Ag = g(t0A)
    foundS = fAg | fB
    resS = _pack_res(
        foundS,
        jnp.where(fAg, g(sigA), sigB),
        jnp.where(fAg, g(mA), mB),
        jnp.where(fAg, g(payA), payB),
        jnp.where(t0Ag > 0, g(prA), prB),
        jnp.where(t0Ag > 0, t0Ag, t0B),
        carryB[1].astype(jnp.int32),
        carryB[2],
        carryB[16],
    )
    tl_valid = jnp.where(slot_valid.reshape(-1), take_l, L)
    res = res.at[tl_valid].set(resS, mode="drop")
    # ...merged lanes inherit their representative (delta-shifted)
    iota_L = jnp.arange(L, dtype=jnp.int32)
    rep = jnp.where(merged, row_of_lane * reps + rep_var, iota_L)
    dlt = jnp.where(merged, delta, 0)
    for _ in range(4):  # pointer doubling covers chains up to 16 deep
        dlt = dlt + jnp.take(dlt, rep)
        rep = jnp.take(rep, rep)
    resR = jnp.take(res, rep, axis=0)
    resR = resR.at[:, R_M].add(jnp.where(resR[:, R_SIG] > 0, dlt, 0))
    resR = resR.at[:, R_PRET].add(
        jnp.where(resR[:, R_TAIL0] > 0, dlt, 0)
    )
    resR = resR.at[:, R_BLK].add(dlt)
    res = jnp.where(merged[:, None], resR, res)
    return res, vm


@partial(jax.jit, static_argnames=("bpm", "R"))
def _resolve_fast(res, ovr, bpm: int, R: int, is_first, is_last, real_row,
                  frame_first, first_idx, last_idx, ov_bits, win_bits):
    """Device fast-path authority resolve: the host _resolve's walk WITH
    optimistic continuation, as data-parallel algebra.

    Per chunk row the [bpm] link results form a variant -> successor-
    variant transfer map; a SEGMENTED (per-frame) associative scan
    composes the maps, so the whole authority chain -- a strictly
    sequential pointer-chase on the host (the reference's implied serial
    order, decoder.c:364-388) -- costs log2(R) gather-compose passes on
    device.  A row whose authoritative lane has NO link continues
    through the successor row's majority-vote lane (the host's
    optimistic continuation): the handoff entry comes from the failed
    lane's earliest strip boundary (tail0) and the successor becomes a
    RECOVERY row, to be re-probed from the handoff state.  A row whose
    picked authority is a roster-dropped lane (alive == 2, two-phase
    probe) is also a recovery row, but its entry is the MATCHED state
    and its outgoing link routes through its own row's majority lane.
    ``ovr`` is the device analog of the host walk's ``reres`` side
    store: a [R, 11] table of re-probed truths (valid, sig, m, pay,
    pret, tail0, alive, blk, entry_bit, entry_slot, by_handoff); a valid
    override row's authority is absolute -- its link applies to EVERY
    incoming token, which is what lets the next round's scan walk past
    windows where no phase variant converged at all.

    Returns (status, f_start [R], f_slot [R], g0 [R], nblk [R],
    frame_tot [F], rec [R, 3]): status = -1 on a fatal condition
    (unresolvable handoff; use the host walk), else
    (pending_rows << 16) | recovery_rows; rec rows are (is_recovery,
    assumed_sig, assumed_pay).  All outputs are device-resident and
    final once status == 0.
    """
    i32 = jnp.int32
    sig = res[:, R_SIG].reshape(R, bpm)
    m = res[:, R_M].reshape(R, bpm)
    pay = res[:, R_PAY].reshape(R, bpm)
    pret = res[:, R_PRET].reshape(R, bpm)
    tail0 = res[:, R_TAIL0].reshape(R, bpm)
    alive = res[:, R_ALIVE].reshape(R, bpm)
    blk = res[:, R_BLK].reshape(R, bpm)
    su = res[:, R_SU].reshape(R, bpm)
    MISS = bpm  # absorbing "unresolved" token
    ok = (sig > 0) & (alive == 0)

    ovr_valid = ovr[:, 0] > 0
    o_sig, o_m, o_pay, o_pret, o_tail0, o_alive, o_blk = (
        ovr[:, i] for i in range(1, 8)
    )
    o_hbit, o_hslot = ovr[:, 8], ovr[:, 9]
    o_byhand = ovr[:, 10] > 0
    o_ok = (o_sig > 0) & (o_alive == 0)

    # Majority-vote fallback lane per row (host: votes among converged
    # variants' (sig, pay); ties -> lowest variant).
    votes = jnp.zeros((R, bpm), i32)
    for w in range(bpm):
        agree = (
            ok & ok[:, w : w + 1]
            & (sig == sig[:, w : w + 1]) & (pay == pay[:, w : w + 1])
        )
        votes = votes + agree.astype(i32)
    votes = jnp.where(ok, votes, -1)
    # argmax with lowest-variant tie-break
    score = votes * bpm + (bpm - 1 - jnp.arange(bpm, dtype=i32))[None, :]
    fb = jnp.argmax(score, axis=1).astype(i32)
    has_fb = jnp.take_along_axis(ok, fb[:, None], axis=1)[:, 0]
    fb = jnp.where(has_fb, fb, MISS)
    # frame-LAST rows have no outgoing links (succ = -1), so a handoff
    # into one cannot pick a linking lane; the re-probe supplies the
    # whole result (host path: reres + R_BLK), so any token works
    fb = jnp.where(is_last, 0, fb)
    # a failed link at row r hands off to row r+1's fallback lane
    fb_next = jnp.concatenate([fb[1:], jnp.full(1, MISS, i32)])

    # Roster-dropped lanes (alive == 2, two-phase probe): their ENTRY is
    # known (a true vm match) but their counts/links are not -- the
    # outgoing link routes through the row's OWN majority lane (the host
    # walk's votes at an incomplete row), while a plain link miss routes
    # through the SUCCESSOR row's majority from a tail0 handoff.
    drop2 = alive == 2
    fbv = jnp.clip(fb, 0, bpm - 1)[:, None]
    sig_fb = jnp.take_along_axis(sig, fbv, axis=1)
    pay_fb = jnp.take_along_axis(pay, fbv, axis=1)
    eff_ok = ok | (drop2 & has_fb[:, None])
    eff_sig = jnp.where(ok, sig, jnp.where(drop2, sig_fb, 0))
    eff_pay = jnp.where(ok, pay, jnp.where(drop2, pay_fb, 0))

    nxt = jnp.where(
        eff_ok, (eff_pay >> 4) & 15, fb_next[:, None]
    ).astype(i32)
    nxt = jnp.where(drop2 & ~eff_ok, MISS, nxt)
    maps = jnp.concatenate(
        [jnp.minimum(nxt, MISS), jnp.full((R, 1), MISS, i32)], axis=1
    )
    # override rows: authority absolute, same successor for every token
    o_nxt = jnp.where(o_ok, (o_pay >> 4) & 15, fb_next).astype(i32)
    maps = jnp.where(
        ovr_valid[:, None], jnp.minimum(o_nxt, MISS)[:, None], maps
    )
    ident = jnp.broadcast_to(jnp.arange(bpm + 1, dtype=i32), (R, bpm + 1))
    maps = jnp.where(real_row[:, None], maps, ident)

    def combine(a, b):
        fa, ma = a
        fb_, mb = b
        comp = jnp.take_along_axis(mb, jnp.clip(ma, 0, MISS), axis=-1)
        return fa | fb_, jnp.where(fb_[:, None], mb, comp)

    _, m_c = jax.lax.associative_scan(
        combine, (is_first, maps), axis=0
    )
    # entry token of row r: composition f0..r-1 applied to token 0
    # (chunk 0 of every frame starts at the true origin, variant 0)
    tok0 = m_c[:, 0]
    vtok = jnp.concatenate([jnp.zeros(1, i32), tok0[:-1]])
    vtok = jnp.where(is_first, 0, vtok)

    vc = jnp.clip(vtok, 0, bpm - 1)[:, None]

    def pick(x, o_x):
        return jnp.where(
            ovr_valid, o_x, jnp.take_along_axis(x, vc, axis=1)[:, 0]
        )

    sig_t = pick(eff_sig, o_sig)
    m_t = pick(m, o_m)
    pay_t = pick(eff_pay, o_pay)
    pret_t = pick(pret, o_pret)
    tail0_t = pick(tail0, o_tail0)
    alive_t = pick(alive, o_alive)
    blk_t = pick(blk, o_blk)
    link_ok = pick(eff_ok.astype(i32), o_ok.astype(i32)) > 0
    resolved = ovr_valid | (vtok < MISS)

    prev = lambda x: jnp.concatenate(  # noqa: E731
        [jnp.zeros(1, x.dtype), x[:-1]]
    )
    # handoff recovery: predecessor resolved but its link missed (and it
    # was not itself a dropped lane -- that case has no tail0 handoff
    # and resolves through its own override next round)
    recov_miss = (
        real_row & ~is_first & ~ovr_valid
        & prev(resolved) & ~prev(link_ok) & (prev(alive_t) != 2)
    )
    # entry-known recovery: the picked authority is a dropped lane
    recov2 = (
        real_row & ~is_first & ~ovr_valid & resolved & (alive_t == 2)
    )
    recov = recov_miss | recov2
    pending = real_row & ~is_first & ~resolved & ~recov
    # handoff entry = predecessor's tail record 0, shifted into the
    # successor window (its bit 0 sits cb bytes after the predecessor's)
    cb_bits = win_bits - ov_bits
    h_bit = ((prev(tail0_t) - 1) >> 4) - cb_bits
    h_slot = (prev(tail0_t) - 1) & 15
    fatal = recov_miss & (
        (prev(tail0_t) <= 0) | (h_bit < 0) | (h_bit >= ov_bits)
    )
    k_of = jnp.where(
        is_first | recov | ovr_valid, 0, prev(pay_t) >> 8
    )
    f_start = jnp.where(
        is_first, 0,
        jnp.where(ovr_valid, o_hbit,
                  jnp.where(recov_miss, h_bit, (prev(sig_t) - 1) >> 4)),
    )
    f_slot = jnp.where(
        is_first, 0,
        jnp.where(ovr_valid, o_hslot,
                  jnp.where(recov_miss, h_slot, (prev(sig_t) - 1) & 15)),
    )
    # a row whose SUCCESSOR entered via handoff spans only to its own
    # tail record 0 (the handoff state), not to a matched link
    nxt_handoff = jnp.concatenate(
        [(recov_miss | (ovr_valid & o_byhand))[1:], jnp.zeros(1, bool)]
    )
    span_m = jnp.where(nxt_handoff, pret_t, m_t)
    nblk = jnp.where(is_last, blk_t, span_m) - k_of
    nblk = jnp.where(recov | pending, 0, nblk)
    nblk = jnp.where(real_row, nblk, 0)
    last_bad = is_last & real_row & ~recov & (alive_t != 0)
    fatal_any = (
        last_bad.any() | fatal.any()
        | (real_row & resolved & ~recov & (nblk < 0)).any()
    )
    n_rec = recov.sum()
    n_pend = pending.sum()
    status = jnp.where(
        fatal_any, -1, (n_pend << 16) | n_rec
    ).astype(i32)
    c = jnp.cumsum(nblk)
    excl = c - nblk
    g0 = excl - jnp.take(excl, frame_first)
    tot = jnp.take(c, last_idx) - jnp.take(excl, first_idx)
    assumed = recov & (vtok < MISS) & link_ok
    rec = jnp.stack(
        [jnp.where(recov2, 2, recov_miss.astype(i32)),
         jnp.where(assumed, sig_t, 0),
         jnp.where(assumed, pay_t, 0)], axis=1
    )
    # observed probe need: max consumed steps among authoritative lanes
    # (override rows excluded -- their need was a re-probe's)
    su_t = jnp.where(
        ovr_valid | ~real_row, 0,
        jnp.take_along_axis(su, vc, axis=1)[:, 0],
    )
    return (status, f_start.astype(i32), f_slot.astype(i32),
            g0.astype(i32), nblk.astype(i32), tot, rec, su_t.max())


@partial(jax.jit, static_argnames=("plan", "bpm", "R", "steps", "chain",
                                   "ov_bits", "cb_bits", "win_cap_bits",
                                   "pad"))
def _fused_recover(res, vm, words, succ_rows, winbits, is_first, is_last,
                   real_row, frame_first, first_idx, last_idx,
                   plan: ScanPlan, bpm: int, R: int, steps: int,
                   chain: bool, ov_bits: int, cb_bits: int,
                   win_cap_bits: int, pad: int = 256):
    """The _fast_try recovery loop as ONE device program.

    The host-orchestrated loop cost ~100 ms per round in tunnel round
    trips alone (bulk rec/fs/fl download + probe_small sync + resolve
    re-sync, measured round 5); a batch with 3 cascaded link-miss
    rounds spent ~300 ms orchestrating ~30 ms of device work.  Here the
    whole ladder -- resolve, top-k selection of missed rows, their
    batched re-probe (write_vm off), override merge, re-resolve -- runs
    under ONE lax.while_loop, so the host pays a single dispatch and a
    single sync regardless of cascade depth.

    Returns (status, f_start, f_slot, g0, nblk, tot, su_max, starved,
    n_rec0, misses): status as _resolve_fast's, su_max the max observed
    probe need, starved = any re-probe starved (host falls back to its
    step ladder), n_rec0 = round-0 recovery count (the kb-growth
    signal), misses = total recovery rows across rounds (metrics).
    """
    i32 = jnp.int32
    iota_R = jnp.arange(R, dtype=i32)
    ovr0 = jnp.zeros((R, 11), i32)

    def resolve(ovr):
        return _resolve_fast(
            res, ovr, bpm, R, is_first, is_last, real_row, frame_first,
            first_idx, last_idx, ov_bits, win_cap_bits,
        )

    st0 = resolve(ovr0)
    n0 = (st0[0] & 0xFFFF).astype(i32)
    state = (
        i32(0), ovr0, st0, jnp.zeros((), jnp.bool_), n0,
    )

    def cond(state):
        rnd, _, st, starved, _ = state
        status = st[0]
        return (
            (rnd < 5) & (status >= 0) & ((status & 0xFFFF) > 0)
            & ~starved
        )

    def body(state):
        rnd, ovr, st, _, misses = state
        _, fs, fl, _, _, _, rec, _ = st
        flags = rec[:, 0] > 0
        ordv = jnp.where(flags, iota_R, R)
        rows = -jax.lax.top_k(-ordv, pad)[0]  # pad smallest = flagged
        valid = rows < R
        rc = jnp.clip(rows, 0, R - 1)
        nb = jnp.where(valid, jnp.take(winbits, rc), 0).astype(i32)
        sbit = jnp.where(valid, jnp.take(fs, rc), 0).astype(i32)
        sslot = jnp.where(valid, jnp.take(fl, rc), 0).astype(i32)
        succ2 = jnp.where(valid, jnp.take(succ_rows, rc), -1).astype(i32)
        words2 = jnp.take(words, rc, axis=0)
        res2, _ = _probe_match(
            plan, words2, jnp.arange(pad, dtype=i32), succ2,
            jnp.zeros(pad, i32), nb, sbit, sslot, vm, steps, chain, R,
            ov_bits, cb_bits, reps=1, write_vm=False,
        )
        starved = (valid & (res2[:, R_ALIVE] != 0)).any()
        newrow = jnp.concatenate(
            [
                jnp.ones((pad, 1), i32),
                res2[:, :7],
                sbit[:, None],
                sslot[:, None],
                (jnp.take(rec[:, 0], rc) == 1).astype(i32)[:, None],
            ],
            axis=1,
        )
        ovr = ovr.at[jnp.where(valid, rc, R)].set(
            newrow.astype(jnp.int32), mode="drop"
        )
        st2 = resolve(ovr)
        return (
            rnd + 1, ovr, st2, starved,
            misses + (st2[0] & 0xFFFF).astype(i32),
        )

    rnd, ovr, st, starved, misses = jax.lax.while_loop(cond, body, state)
    status, f_start, f_slot, g0, nblk, tot, rec, su_max = st
    # rounds exhausted with work left -> force the host-walk fallback
    status = jnp.where(
        (rnd >= 5) & ((status & 0xFFFF) > 0), i32(-2), status
    )
    return (status, f_start, f_slot, g0, nblk, tot, su_max, starved,
            n0, misses, rnd)


def _fast_try_fused(res_d, plan, bpm, R, j_isf, j_isl, j_real,
                    j_frame_first, j_fidx, j_lidx, ov_bits, win_cap_bits,
                    jwords, j_frb, j_winbits, fsteps0, fhard, nrows,
                    chain, vm, steps, total_blocks, ent, lkey):
    """_fast_try on the fused device recovery loop: probe -> recover
    ladder -> optimistic final all queue async; the host pays ONE sync
    for the whole resolve, then only the rare starvation ladder."""
    from ..utils.metrics import default_metrics

    iota_R = jnp.arange(R, dtype=jnp.int32)
    succ_rows = jnp.where(j_isl | ~j_real, -1, iota_R + 1)
    with default_metrics.stage("speculative.fast_resolve"):
        (status_d, fs_d, fl_d, g0_d, nblk_d, tot_d, su_d, pstarved_d,
         nrec0_d, miss_d, rnd_d) = _fused_recover(
            res_d, vm, jwords, succ_rows, j_winbits, j_isf, j_isl,
            j_real, j_frame_first, j_fidx, j_lidx, plan, bpm, R, steps,
            chain, ov_bits, win_cap_bits - ov_bits, win_cap_bits,
            pad=min(256, R),
        )
        fsteps = fsteps0
        # Optimistic: the final queues behind the recovery loop; wasted
        # device time only when the loop ends in a fallback (rare).
        coeffs, fstarved_d, fsu_d = _final_decode(
            plan, jwords, j_frb, j_winbits, fs_d, fl_d, g0_d, nblk_d,
            j_frame_first, fsteps, nrows, chain,
        )
        (status, su_obs, pstarved, nrec0, misses, rounds, fst, fsu,
         tot) = jax.device_get(
            (status_d, su_d, pstarved_d, nrec0_d, miss_d, rnd_d,
             fstarved_d, fsu_d, tot_d)
        )
        status, fst = int(status), bool(fst)
    if rounds:
        default_metrics.count("speculative.reprobe_rounds", int(rounds))
        default_metrics.count("speculative.link_misses", int(misses))
    if int(nrec0) > max(16, R // 16):
        _learned_kb[lkey] = min(bpm - 1, _learned_kb.get(lkey, 2) + 1)
        default_metrics.count("speculative.kb_grows")
    if bool(pstarved) or status < 0 or (status >> 16) or (status & 0xFFFF):
        return None  # host walk owns the step-bound ladder / fatal cases
    while fst and fsteps < fhard:
        default_metrics.count("speculative.final_retries")
        fsteps = min(
            fhard, -(-(fsteps * 3 // 2) // STEP_BUCKET) * STEP_BUCKET
        )
        coeffs, fstarved_d, fsu_d = _final_decode(
            plan, jwords, j_frb, j_winbits, fs_d, fl_d, g0_d, nblk_d,
            j_frame_first, fsteps, nrows, chain,
        )
        fst, fsu = jax.device_get((fstarved_d, fsu_d))
        fst = bool(fst)
    ent[0] = max(steps, ent[0])
    ent[1] = max(fsteps, ent[1])
    ent[2] = max(ent[2], int(su_obs))
    ent[3] = max(ent[3], int(fsu))
    n_use = [int(min(t, total_blocks)) for t in np.asarray(tot)]
    return coeffs, n_use


def _fast_try(res_d, plan, bpm, R, j_isf, j_isl, j_real, j_frame_first,
              j_fidx, j_lidx, ov_bits, win_cap_bits, jwords, j_frb,
              j_winbits, fsteps0, fhard, nrows, chain, probe_small, vm,
              steps, is_last, total_blocks, win_bits, ent, lkey):
    """Drive the device fast-path resolve end to end.

    Clean batch: probe -> _resolve_fast -> final all dispatch async with
    ONE host sync.  Link misses: download the small recovery table, ONE
    batched re-probe round from the handoff states, fold the truths into
    the override table, and re-run the (cheap) device resolve -- the
    device mirror of the host walk's rounds.  Returns (coeffs, n_use) or
    None to fall back to the host walk (fatal layout or a starved lane
    -- the host path owns the step-bound retry ladder)."""
    from ..utils.metrics import default_metrics

    if os.environ.get("JPEG_TPU_SPEC_TIME"):
        # Debug decomposition: isolate the probe's device wall from the
        # resolve/final tail (costs one extra RTT; off in production).
        with default_metrics.stage("speculative.fr_probe_wait"):
            np.asarray(res_d[:2, :2])
    if os.environ.get("JPEG_TPU_SPEC_FUSED", "1") != "0":
        return _fast_try_fused(
            res_d, plan, bpm, R, j_isf, j_isl, j_real, j_frame_first,
            j_fidx, j_lidx, ov_bits, win_cap_bits, jwords, j_frb,
            j_winbits, fsteps0, fhard, nrows, chain, vm, steps,
            total_blocks, ent, lkey,
        )
    ovr_np = np.zeros((R, 11), np.int32)
    fsteps = fsteps0
    coeffs = fst = None
    with default_metrics.stage("speculative.fast_resolve"):
        for rnd in range(5):
            (status_d, fs_d, fl_d, g0_d, nblk_d, tot_d,
             rec_d, su_d) = _resolve_fast(
                res_d, jnp.asarray(ovr_np), bpm, R, j_isf, j_isl, j_real,
                j_frame_first, j_fidx, j_lidx, ov_bits, win_cap_bits,
            )
            if rnd == 0:
                # Optimistic: dispatch the final before knowing the
                # status -- wasted device time only when a recovery
                # round is needed; saves one RTT on clean batches.
                coeffs, fstarved_d, fsu_d = _final_decode(
                    plan, jwords, j_frb, j_winbits, fs_d, fl_d, g0_d,
                    nblk_d, j_frame_first, fsteps, nrows, chain,
                )
                # This sync's wall = probe + resolve + final execution
                # (everything queued so far) + one RTT.
                with default_metrics.stage("speculative.fr_sync0"):
                    status, fst, su_obs, fsu = jax.device_get(
                        (status_d, fstarved_d, su_d, fsu_d)
                    )
                status, fst = int(status), bool(fst)
            else:
                with default_metrics.stage("speculative.fr_resync"):
                    status, su_obs = jax.device_get((status_d, su_d))
                status = int(status)
            if status < 0:
                return None
            n_rec = status & 0xFFFF
            if n_rec == 0:
                if status >> 16:
                    return None  # pending rows but nothing to re-probe
                if rnd > 0:
                    coeffs, fstarved_d, fsu_d = _final_decode(
                        plan, jwords, j_frb, j_winbits, fs_d, fl_d, g0_d,
                        nblk_d, j_frame_first, fsteps, nrows, chain,
                    )
                    fst, fsu = jax.device_get((fstarved_d, fsu_d))
                    fst = bool(fst)
                break
            default_metrics.count("speculative.reprobe_rounds")
            default_metrics.count("speculative.link_misses", n_rec)
            if rnd == 0 and n_rec > max(16, R // 16):
                # the survivor roster dropped live trajectories
                # wholesale: widen it for this stream's later batches
                _learned_kb[lkey] = min(
                    bpm - 1, _learned_kb.get(lkey, 2) + 1
                )
                default_metrics.count("speculative.kb_grows")
            with default_metrics.stage("speculative.fr_recovery"):
                # ONE bulk device_get: each separate np.asarray is a
                # blocking tunnel round trip (~15-40 ms here); three of
                # them made every recovery round ~123 ms.
                rec, f_start_h, f_slot_h = jax.device_get(
                    (rec_d, fs_d, fl_d)
                )
                rows_list = np.nonzero(rec[:, 0])[0]
                sbit = f_start_h[rows_list].astype(np.int32)
                sslot = f_slot_h[rows_list].astype(np.int32)
                nb = win_bits[rows_list].astype(np.int32)
                res2_h, vm = probe_small(
                    rows_list, sbit, sslot, nb, vm, steps
                )
            for i, row in enumerate(rows_list):
                r2 = res2_h[i]
                if r2[R_ALIVE]:
                    return None  # starved re-probe: host ladder decides
                if rec[row, 1] > 0 and not is_last[row] and (
                    (int(r2[R_SIG]), int(r2[R_PAY]))
                    != (int(rec[row, 1]), int(rec[row, 2]))
                ):
                    # the continuation guessed wrong; the override now
                    # carries the truth and the next round re-walks
                    # everything downstream of it
                    default_metrics.count(
                        "speculative.optimistic_mispredicts"
                    )
                ovr_np[row, 0] = 1
                ovr_np[row, 1:8] = r2[:7]
                ovr_np[row, 8] = sbit[i]
                ovr_np[row, 9] = sslot[i]
                ovr_np[row, 10] = 1 if rec[row, 0] == 1 else 0
        else:
            return None  # rounds exhausted; host walk takes over
    while fst and fsteps < fhard:
        default_metrics.count("speculative.final_retries")
        fsteps = min(
            fhard, -(-(fsteps * 3 // 2) // STEP_BUCKET) * STEP_BUCKET
        )
        coeffs, fstarved_d, fsu_d = _final_decode(
            plan, jwords, j_frb, j_winbits, fs_d, fl_d, g0_d, nblk_d,
            j_frame_first, fsteps, nrows, chain,
        )
        fst, fsu = jax.device_get((fstarved_d, fsu_d))
        fst = bool(fst)
    ent[0] = max(steps, ent[0])
    ent[1] = max(fsteps, ent[1])
    ent[2] = max(ent[2], int(su_obs))
    ent[3] = max(ent[3], int(fsu))
    n_use = [int(min(t, total_blocks)) for t in np.asarray(tot_d)]
    return coeffs, n_use


@partial(jax.jit, static_argnames=("plan", "max_steps", "nrows", "chain"))
def _final_decode(plan: ScanPlan, words, frame_row_base, nbits,
                  start_bit, start_slot, g0, nblk, frame_first,
                  max_steps: int, nrows: int, chain: bool):
    """Authoritative re-decode: chunk row i emits its nblk[i] blocks; the
    within-frame block ordinal g0[i]+blk resolves to the PLANE row (the
    decoder.c:319-358 block walk, same affine form as
    lockstep_jax._place_emissions) and frame_row_base[i] lifts it into
    the batch's concatenated-planes buffer [nrows, 64].  DC emissions are
    lane-local cumulative; the cross-chunk per-component DC prefix
    (decoder.c:350-355 chain, reset at each frame's first chunk row via
    ``frame_first``) folds in HERE, per emission, before the single
    placement scatter -- no host inverse block->lane map, no second
    dispatch.  Returns (coeffs [nrows, 64], starved)."""
    R = words.shape[0]
    hv_cols, iota_hv = _hv_consts(plan)
    if chain:
        consts = (("none",), nbits, jnp.full_like(start_bit, 1 << 29),
                  nblk, jnp.int32(1 << 29), jnp.int32(0), hv_cols, iota_hv)
        carry, (em_key, em_val, _, _) = _chain_scan(
            plan, consts, words.T, start_bit, start_slot, nbits, max_steps
        )
    else:
        rows = jnp.arange(R, dtype=jnp.int32)
        refill = ("gather", words.reshape(-1), rows, words.shape[1])
        consts = (refill, nbits, jnp.full_like(start_bit, 1 << 29), nblk,
                  jnp.int32(1 << 29), jnp.int32(0), hv_cols, iota_hv)
        init = _init_carry(plan, refill, start_bit, start_slot, nbits)

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
    flat = jnp.where(
        good, (frame_row_base[None, :] + row) * 64 + pos, nrows * 64
    ).reshape(-1)
    # ---- fused DC prefix: dc_final[c, r] = lane r's last cumulative DC
    # of component c; its per-frame exclusive prefix is each lane's
    # incoming DC base.  Emissions carry lane-LOCAL cumulative DC, so
    # adding base[comp, lane] to every pos==0 emission finishes the
    # decoder.c:350-355 predictor chain without leaving the kernel.
    dc_final = jnp.stack(carry[5])  # [C, R]
    csum = jnp.cumsum(dc_final, axis=1)
    base_g = csum - dc_final  # [C, R] exclusive global
    base0 = jnp.take_along_axis(
        base_g, jnp.broadcast_to(frame_first[None, :], base_g.shape), axis=1
    )
    dc_base = base_g - base0  # [C, R] per-frame exclusive prefix
    comp_e = slotc(plan.slot_comp.astype(np.int64))
    fix = jnp.zeros_like(em_val)
    for c in range(dc_final.shape[0]):
        fix = jnp.where(comp_e == c, dc_base[c][None, :], fix)
    em_val = jnp.where(good & (pos == 0), em_val + fix, em_val)
    out = jnp.zeros(nrows * 64, jnp.int32)
    # write-once slots: scatter-set beats scatter-add ~1.5x on v5e
    out = out.at[flat].set(em_val.reshape(-1), mode="drop")
    starved = carry[1].any()
    return out.reshape(nrows, 64), starved, carry[16].max()


def _fallback(why: str = ""):
    # Silent de-parallelization must be observable: count every fallback
    # (with its reason) in the default metrics so `-v` / metrics output
    # reveals a stream that quietly went serial.
    from ..utils.metrics import default_metrics

    default_metrics.count("speculative.fallbacks")
    default_metrics.count(
        f"speculative.fallback[{why.split(':')[0] or 'unknown'}]"
    )
    if os.environ.get("JPEG_TPU_SPEC_DEBUG"):
        print(f"[speculative] fallback: {why}", flush=True)
    return None


def _cached_plan_of(geom, info, tables):
    from .lockstep_jax import _cached_plan

    return _cached_plan(
        geom, info, tuple(sorted((k, t.spec) for k, t in tables.items()))
    )


def _speculative_core_batch(
    geom: FrameGeometry,
    info: ScanInfo,
    tables: Dict[Tuple[int, int], HuffTable],
    segments: List[np.ndarray],  # one unstuffed RST-less ECS per frame
    lanes: int = 512,
    max_rounds: Optional[int] = None,
):
    """Probe + match + resolve + final decode of F same-geometry frames.

    Returns (coeffs [F * total_blocks, 64] DEVICE-resident, plane order,
    DC fixed up, n_use list) -- or None when the batch defeats
    resolution (caller falls back per frame).
    """
    from ..utils.metrics import default_metrics

    plan = _cached_plan_of(geom, info, tables)
    bpm = plan.blocks_per_mcu
    total_blocks = sum(
        geom.by_id(cid).n_blocks for cid in info.component_ids
    )
    F = len(segments)
    segs = [np.asarray(s, np.uint8) for s in segments]
    sizes = [int(s.size) for s in segs]
    if F == 0 or bpm > 16 or min(sizes) < 2048:
        return _fallback(
            f"too small / bpm: n={min(sizes or [0])} bpm={bpm}"
        )

    # Chunking: pow2 chunk bytes, >= 512 (small chunks keep the probe's
    # step count low and its refill on the cheap select-chain path);
    # ``lanes`` caps the per-frame chunk count.
    n_max = max(sizes)
    cb = 1 << max(9, (-(-n_max // max(4, lanes)) - 1).bit_length())
    ov = 256 if cb >= 1024 else 128  # sync-strip bytes (overlap)
    win = cb + ov
    wn = (win + 8 + 3) // 4 + 2
    chain = wn <= CHAIN_WN_MAX
    cb_bits, ov_bits = cb * 8, ov * 8

    # Per-frame chunk rows; all frames concatenate into one row table.
    # Windows overlap by ``ov`` bytes, so each frame's matrix is ONE
    # strided view copy of its zero-padded segment (no per-chunk loop).
    # The row count pads to 64-row buckets (dead rows: win_bits=0, no
    # frame) so different streams share compiled programs -- every
    # distinct (rows, steps) shape costs a full XLA compile.
    S_f = [max(1, -(-n // cb)) for n in sizes]
    row_base = np.concatenate(([0], np.cumsum(S_f))).astype(np.int64)
    R_real = int(row_base[-1])
    R = -(-R_real // 64) * 64
    with default_metrics.stage("speculative.window_build"):
        wmat = np.zeros((R, wn * 4), dtype=np.uint8)
        win_bits = np.zeros(R, np.int64)
        for f in range(F):
            n, S = sizes[f], S_f[f]
            pad = np.zeros((S - 1) * cb + win, np.uint8)
            pad[:n] = segs[f]
            view = np.lib.stride_tricks.sliding_window_view(pad, win)[::cb]
            r0 = int(row_base[f])
            wmat[r0 : r0 + S, :win] = view[:S]
            lo = np.arange(S, dtype=np.int64) * cb
            win_bits[r0 : r0 + S] = (np.minimum(lo + win, n) - lo) * 8
        # BE-u32 words via a dtype view: one vectorized byteswap pass
        # (the shift/sum form cost ~14 ms/8-frame batch, 10x more under
        # the box's contended phases).
        words = wmat.view(">u4").astype(np.uint32)

    # Lanes: bpm phase variants per chunk row.
    L = R * bpm
    row_of_lane = np.repeat(np.arange(R, dtype=np.int32), bpm)
    variant = np.tile(np.arange(bpm, dtype=np.int32), R)
    succ = row_of_lane + 1  # successor row; -1 for each frame's last
    succ[np.isin(row_of_lane, row_base[1:] - 1)] = -1
    succ[row_of_lane >= R_real] = -1  # shape-padding rows
    nbits_l = win_bits[row_of_lane].astype(np.int32)

    # A variant lane decodes a junk prefix (~3.5 bits/symbol) until it
    # converges inside the sync strip, then true content (~4.5+ -- be
    # conservative: an extra ~15% of steps is far cheaper than a whole
    # re-dispatch).  The bound must cover BOTH so the authoritative lane
    # finishes its window on the first probe; the hard retry covers
    # dense content.  Step bounds that a retry ladder had to raise are
    # STICKY per (plan, chunk size): the next batch of the stream starts
    # at the proven bound instead of re-paying the failed dispatch.
    steps = (ov_bits // 3 + win * 8 * 2 // 9 + 64 + 63) // 64 * 64
    hard_steps = (win * 8 // 3 + ov_bits // 3 + 96 + 63) // 64 * 64
    lkey = (id(plan), cb)
    learned = _learned_steps.get(lkey)
    if learned is not None:
        steps = max(steps, learned[0])
        if learned[2]:
            # observed need (max consumed steps of authoritative lanes
            # over this stream's batches) + margin, bucket-quantized so
            # the narrowed jit key is a fixed point; the starvation
            # ladder is the backstop if content densifies mid-stream
            steps = _narrow(steps, learned[2], 160, KILL_STEPS + 64)

    jwords = jnp.asarray(words)
    jrow = jnp.asarray(row_of_lane)
    jsucc = jnp.asarray(succ)
    jvar = jnp.asarray(variant)

    kb = _learned_kb.get(lkey, 2) if bpm >= 3 else 0
    kill = KILL_STEPS if kb else 0

    def probe(sbit, sslot, nb, vm, st):
        return _probe_match(
            plan, jwords, jrow, jsucc, jvar,
            jnp.asarray(nb, dtype=jnp.int32),
            jnp.asarray(sbit, dtype=jnp.int32),
            jnp.asarray(sslot, dtype=jnp.int32), vm, st, chain, R,
            ov_bits, cb_bits, reps=bpm, kill_steps=kill, kb=kb,
        )

    def probe_small(rows_np, sbit, sslot, nb, vm, st):
        """Re-probe ONLY the failed rows (padded to a 128-row bucket)
        instead of redispatching all L lanes: a resolve round's device
        cost drops from the full probe (~L x steps) to noise.  The
        window matrix compacts to the failed rows, so the refill row ids
        are LOCAL (a global id would index the compacted matrix out of
        place in gather-refill mode); successor ids stay GLOBAL so the
        tail walk matches into the shared membership maps (vm writes are
        off: a re-probe lane's incoming edge is already resolved)."""
        L2 = len(rows_np)
        pad = max(128, 1 << (L2 - 1).bit_length()) if L2 > 1 else 128
        rows_p = np.zeros(pad, np.int32)
        rows_p[:L2] = rows_np
        arr = np.zeros((3, pad), np.int32)
        arr[0, :L2], arr[1, :L2], arr[2, :L2] = sbit, sslot, nb
        succ2 = np.full(pad, -1, np.int32)
        succ2[:L2] = succ[np.asarray(rows_np, np.int64) * bpm]
        jr = jnp.asarray(rows_p)
        res2, vm = _probe_match(
            plan, jnp.take(jwords, jr, axis=0),
            jnp.arange(pad, dtype=jnp.int32),
            jnp.asarray(succ2), jnp.zeros(pad, jnp.int32),
            jnp.asarray(arr[2]), jnp.asarray(arr[0]),
            jnp.asarray(arr[1]), vm, st, chain, R,
            ov_bits, cb_bits, reps=1, write_vm=False,
        )
        return np.asarray(res2)[:L2], vm

    start_bit0 = np.zeros(L, np.int32)
    rounds = max_rounds or max(12, R // 2)

    # ---- shared final-decode geometry (device fast path + host path) ---
    frame_row_base = np.zeros(R, np.int64)
    frame_row_base[:R_real] = np.repeat(
        np.arange(F, dtype=np.int64) * total_blocks,
        np.diff(row_base).astype(np.int64),
    )
    nrows = F * total_blocks
    frame_first = np.zeros(R, np.int32)
    frame_first[:R_real] = np.repeat(
        row_base[:-1], np.diff(row_base).astype(np.int64)
    ).astype(np.int32)
    # A span runs from sigma_r (within the first ov bytes of chunk r) to
    # sigma_{r+1} -- up to the FULL window, not just cb bytes.  A bound
    # the ladder had to raise is sticky (per plan + chunk size): later
    # batches of the stream pay ONE final dispatch, not the ladder.
    fsteps0 = int(win * 8 * 2 // 9 + 96 + 63) // 64 * 64
    fhard = int(win * 8 + 66 + 63) // 64 * 64
    if learned is not None:
        fsteps0 = max(fsteps0, learned[1])
        if learned[3]:
            fsteps0 = _narrow(fsteps0, learned[3], 128, 192)
    fsteps0 = min(fsteps0, fhard)
    j_frame_first = jnp.asarray(frame_first)
    j_frb = jnp.asarray(frame_row_base.astype(np.int32))
    j_winbits = jnp.asarray(win_bits.astype(np.int32))
    ent = _learned_steps.setdefault(lkey, [0, 0, 0, 0])

    def run_final(f_start, f_slot, g0, nblk):
        """Final-decode retry ladder; args may live on device or host."""
        fsteps = fsteps0
        args = tuple(
            x if isinstance(x, jnp.ndarray) else jnp.asarray(
                np.asarray(x, np.int32))
            for x in (f_start, f_slot, g0, nblk)
        )
        with default_metrics.stage("speculative.final"):
            while True:
                coeffs, fstarved, fsu = _final_decode(
                    plan, jwords, j_frb, j_winbits, *args,
                    j_frame_first, fsteps, nrows, chain,
                )
                if not bool(np.asarray(fstarved)) or fsteps >= fhard:
                    break
                default_metrics.count("speculative.final_retries")
                # bucket-quantized rungs: retries reuse compiled keys
                fsteps = min(
                    fhard,
                    -(-(fsteps * 3 // 2) // STEP_BUCKET) * STEP_BUCKET,
                )
        ent[1] = max(fsteps, ent[1])
        ent[3] = max(ent[3], int(np.asarray(fsu)))
        return coeffs

    # Row-structure masks for the device fast-path resolve.
    is_first = np.zeros(R, bool)
    is_first[row_base[:-1]] = True
    is_last = np.zeros(R, bool)
    is_last[row_base[1:] - 1] = True
    real_row = np.zeros(R, bool)
    real_row[:R_real] = True
    j_isf, j_isl, j_real = map(jnp.asarray, (is_first, is_last, real_row))
    j_fidx = jnp.asarray(row_base[:-1].astype(np.int32))
    j_lidx = jnp.asarray((row_base[1:] - 1).astype(np.int32))
    use_fast = os.environ.get("JPEG_TPU_SPEC_HOST") != "1"

    for attempt in range(2):  # step-bound ladder for starved true lanes
        default_metrics.count("speculative.probe_dispatches")
        if attempt:
            default_metrics.count("speculative.hard_retries")
        vm = jnp.zeros(R * ov_bits, jnp.int32)
        res_d, vm = probe(start_bit0, variant, nbits_l, vm, steps)

        if use_fast:
            out2 = _fast_try(
                res_d, plan, bpm, R, j_isf, j_isl, j_real, j_frame_first,
                j_fidx, j_lidx, ov_bits, cb_bits + ov_bits, jwords, j_frb,
                j_winbits, fsteps0, fhard, nrows, chain, probe_small, vm,
                steps, is_last, total_blocks, win_bits, ent, lkey,
            )
            if out2 is not None:
                return out2
            default_metrics.count("speculative.fast_misses")

        with default_metrics.stage("speculative.probe_sync"):
            res_h = np.asarray(res_d)  # [L, 8] link-table download

        with default_metrics.stage("speculative.resolve"):
            out = _resolve(
                res_h, plan, F, R, bpm, row_base, win_bits, cb_bits,
                ov_bits, rounds, probe_small, vm, steps, L, R_real,
            )
        if out == "starved" and steps < hard_steps:
            steps = hard_steps
            continue
        break
    if isinstance(out, str):
        return _fallback(out)
    ent[0] = max(steps, ent[0])
    v_of, k_of, f_start, f_slot, nblk = out
    auth = v_of[:R_real]
    arow = np.nonzero((auth >= 0) & (auth < bpm))[0]
    if arow.size:
        ent[2] = max(
            ent[2], int(res_h[arow * bpm + auth[arow], R_SU].max())
        )

    g0_within = np.zeros(R, np.int64)
    n_use = []
    for f in range(F):
        r0, r1 = int(row_base[f]), int(row_base[f + 1])
        c = np.cumsum(nblk[r0:r1]) - nblk[r0:r1]
        g0_within[r0:r1] = c
        n_use.append(int(min(c[-1] + nblk[r1 - 1], total_blocks)))
    coeffs = run_final(f_start, f_slot, g0_within, nblk)
    return coeffs, n_use


def _resolve(res_h, plan, F, R, bpm, row_base, win_bits, cb_bits, ov_bits,
             rounds, probe, vm, steps, L, R_real=None):
    """Host authority chain over the device link results.

    ``probe`` is the SMALL-shape re-probe: probe(rows, sbit, sslot, nb,
    vm, steps) -> (res [len(rows), 8] host, vm) dispatching only the
    failed rows (padded to a 128-row bucket) against the shared
    device-resident maps.  Returns (v_of, k_of, f_start, f_slot, nblk)
    on success, or a string reason for fallback ("starved" asks the
    caller to retry the whole probe at the hard step bound).  Rows past
    ``R_real`` are shape padding (no frame, zero window): excluded from
    the convergence check, zero blocks in the final decode."""
    if R_real is None:
        R_real = R
    v_of = np.full(R, -1, np.int64)  # authoritative variant (bpm = reprobe)
    k_of = np.zeros(R, np.int64)  # blk ordinal of the row's sync record
    f_start = np.zeros(R, np.int64)
    f_slot = np.zeros(R, np.int64)
    nblk = np.full(R, -1, np.int64)
    v_of[R_real:] = bpm  # padding rows: trivially resolved, no blocks
    nblk[R_real:] = 0
    for f in range(F):
        v_of[row_base[f]] = 0  # chunk 0 starts at the true origin

    lane_res = res_h  # original probe records (never mutated)
    # Re-probe truths live in a SIDE store: overwriting lane slot 0
    # would desynchronize it from vm entries that still reference the
    # original variant-0 lane's ordinals.
    reres: Dict[int, np.ndarray] = {}

    _nores = np.zeros(8, res_h.dtype)  # missing re-probe -> walk falls
    #                                      back via "no tail boundary"

    def rec_of(r):
        v = int(v_of[r])
        return reres.get(r, _nores) if v >= bpm else lane_res[r * bpm + v]

    from ..utils.metrics import default_metrics

    for rnd in range(rounds):
        failed: Dict[int, Tuple[int, int]] = {}
        # row -> (sig, pay) the walk CONTINUED past on a majority vote of
        # the row's converged variant lanes; verified against the row's
        # re-probe at round end (several links repair per round instead
        # of one per frame).
        pending: Dict[int, Tuple[int, int]] = {}
        for f in range(F):
            r0, r1 = int(row_base[f]), int(row_base[f + 1])
            r = r0
            while r < r1 - 1:
                if v_of[r] < 0:
                    break
                if v_of[r + 1] >= 0:
                    r += 1
                    continue
                rec = rec_of(r)
                if rec[R_ALIVE] == 1:
                    # the authoritative lane starved: its records are
                    # incomplete -- retry the whole probe bigger
                    return "starved"
                if rec[R_ALIVE] == 2:
                    # roster-dropped authority (two-phase probe): the
                    # entry is a true vm match but the counts/links are
                    # not known -- re-probe r from its own entry; the
                    # next round's walk continues from the re-probed
                    # truth (no optimistic continuation here: this host
                    # walk keeps incremental state across rounds, and
                    # chaining guesses through incomplete rows lets a
                    # mispredict survive partial invalidation)
                    failed[r] = (int(f_start[r]), int(f_slot[r]))
                    k_of[r] = 0
                    v_of[r] = bpm
                    break
                sigp = int(rec[R_SIG])
                if sigp > 0:
                    nblk[r] = int(rec[R_M]) - k_of[r]
                    f_start[r + 1] = (sigp - 1) >> 4
                    f_slot[r + 1] = (sigp - 1) & 15
                    pay = int(rec[R_PAY])
                    k_of[r + 1] = pay >> 8
                    v_of[r + 1] = (pay >> 4) & 15
                    r += 1
                    continue
                # Link miss: hand off at the earliest authoritative
                # boundary inside chunk r+1 (tail record 0) and
                # re-probe r+1 from that true state.
                t0 = int(rec[R_TAIL0])
                if t0 <= 0:
                    return f"no tail boundary at row {r}"
                rel2 = ((t0 - 1) >> 4) - cb_bits
                if rel2 < 0 or rel2 >= int(win_bits[r + 1]):
                    return f"handoff out of window at row {r}"
                nblk[r] = int(rec[R_PRET]) - k_of[r]
                f_start[r + 1] = rel2
                f_slot[r + 1] = (t0 - 1) & 15
                k_of[r + 1] = 0
                v_of[r + 1] = bpm  # sentinel: authority via reprobe lane
                failed[r + 1] = (rel2, (t0 - 1) & 15)
                # Optimistic continuation: variant lanes that converged
                # before the sync strip carry the TRUE trajectory's strip
                # records, so their (sig, pay) link into r+2 is correct.
                # Take the majority among converged variants and keep
                # walking; the re-probe verifies at round end and a
                # mispredict invalidates this frame's downstream rows.
                if r + 1 < r1 - 1:
                    votes: Dict[Tuple[int, int], int] = {}
                    for v in range(bpm):
                        lr = lane_res[(r + 1) * bpm + v]
                        if lr[R_SIG] > 0 and not lr[R_ALIVE]:
                            key2 = (int(lr[R_SIG]), int(lr[R_PAY]))
                            votes[key2] = votes.get(key2, 0) + 1
                    if votes:
                        sig2, pay2 = max(votes.items(), key=lambda kv: kv[1])[0]
                        pending[r + 1] = (sig2, pay2)
                        f_start[r + 2] = (sig2 - 1) >> 4
                        f_slot[r + 2] = (sig2 - 1) & 15
                        k_of[r + 2] = pay2 >> 8
                        v_of[r + 2] = (pay2 >> 4) & 15
                        r += 2
                        continue
                break
            # last chunk of the frame: span to stream end
            if v_of[r1 - 1] >= 0 and nblk[r1 - 1] < 0 and (
                (r1 - 1) not in failed
            ):
                rec = rec_of(r1 - 1)
                if rec[R_ALIVE] == 1:
                    return "starved"
                if rec[R_ALIVE] == 2:
                    failed[r1 - 1] = (
                        int(f_start[r1 - 1]), int(f_slot[r1 - 1])
                    )
                    k_of[r1 - 1] = 0
                    v_of[r1 - 1] = bpm
                else:
                    nblk[r1 - 1] = int(rec[R_BLK]) - k_of[r1 - 1]
        if (v_of >= 0).all() and (nblk >= 0).all():
            return v_of, k_of, f_start, f_slot, nblk
        if not failed:
            if (v_of >= 0).all():
                continue
            return f"round {rnd}: no progress"
        # Batched re-probe of all failed rows from their true states
        # (variant slot 0), against the SAME device maps -- a SMALL
        # padded dispatch over just the failed rows, not all L lanes.
        default_metrics.count("speculative.reprobe_rounds")
        default_metrics.count("speculative.link_misses", len(failed))
        rows_list = sorted(failed)
        sbit = np.array([failed[r][0] for r in rows_list], np.int32)
        sslot = np.array([failed[r][1] for r in rows_list], np.int32)
        nb = np.array(
            [int(win_bits[r]) for r in rows_list], np.int32
        )
        res2_h, vm = probe(rows_list, sbit, sslot, nb, vm, steps)
        for i, row in enumerate(rows_list):
            reres[row] = res2_h[i]
            exp = pending.get(row)
            if exp is None or v_of[row] != bpm:
                continue  # not continued past, or already invalidated
            got = (int(res2_h[i][R_SIG]), int(res2_h[i][R_PAY]))
            if got == exp:
                # verified: the true lane's matched-tail ordinal is the
                # row's block count (handoff rows have k_of == 0)
                nblk[row] = int(res2_h[i][R_M]) - k_of[row]
            else:
                # mispredicted continuation: every value this frame
                # derived past `row` is suspect -- clear and re-walk
                # from the (now true) lane_res next round.
                default_metrics.count("speculative.optimistic_mispredicts")
                fi = int(np.searchsorted(row_base, row, side="right")) - 1
                r1 = int(row_base[fi + 1])
                v_of[row + 1 : r1] = -1
                nblk[row + 1 : r1] = -1
    return "unresolved after rounds"


def _speculative_core(
    geom: FrameGeometry,
    info: ScanInfo,
    tables: Dict[Tuple[int, int], HuffTable],
    segment: np.ndarray,  # one unstuffed ECS (uint8)
    lanes: int = 1024,
    max_rounds: Optional[int] = None,
):
    """Single-frame wrapper over the batched core.

    Returns (coeffs [total_blocks, 64] DEVICE-resident, n_use) or None.
    """
    res = _speculative_core_batch(
        geom, info, tables, [np.asarray(segment, np.uint8)], lanes=lanes,
        max_rounds=max_rounds,
    )
    if res is None:
        return None
    coeffs, n_use = res
    return coeffs, n_use[0]


def decode_scan_speculative_jax(
    geom: FrameGeometry,
    info: ScanInfo,
    tables: Dict[Tuple[int, int], HuffTable],
    segment: np.ndarray,  # one unstuffed ECS (uint8)
    planes: Dict[int, np.ndarray],
    lanes: int = 1024,
    max_rounds: Optional[int] = None,
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
    plan = _cached_plan_of(geom, info, tables)
    return n_use // plan.blocks_per_mcu


def decode_scan_speculative(
    geom: FrameGeometry,
    info: ScanInfo,
    tables: Dict[Tuple[int, int], HuffTable],
    segments,
    planes: Dict[int, np.ndarray],
    lanes: int = 1024,
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
