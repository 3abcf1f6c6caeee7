"""JAX/TPU lockstep entropy decoder (scalarized scan engine).

The accelerator port of ``lockstep.py``.  All ECS segments decode
simultaneously, one Huffman symbol per lane per step.  The TPU mapping
(measured rules in docs/ARCHITECTURE.md):

  * the scan body is SCALARIZED -- every intermediate is an [S] vector
    (2-D one-hot matrices pad their minor dim to 128 lanes and become
    HBM round trips -- measured: the old [S, 256] huffval one-hot
    matmul was the scan's DOMINANT per-step cost at ~8 MB of traffic);
    small constant axes are unrolled select chains with plan tables
    folded in as HLO constants, including the huffval lookup (packed
    4-bytes-per-word select chain, _hv_consts);
  * the 32-bit bit window rides in the carry and refills with one
    word-select loop per step (a symbol crosses at most one boundary);
  * TPU scatter costs ~8 ns per attempted update, so decode emits ONE
    (key, value) stream: AC coefficients on their step, each block's
    final DC via a one-step-delayed pending emission that always lands
    on a free slot;
  * loop iterations with HBM-carried state cost ~100us flat --
    ``lax.scan`` + ``unroll`` + emissions-as-ys amortize it.

Correctness contract (shared with the NumPy engine and the C++ kernel):
segments are independent (T.81 resets DC prediction at RST markers);
global placement uses an exclusive prefix-sum of per-segment MCU counts.
The broadcast-style ``_symbol_step`` is retained for the experimental
Pallas kernel, which shares its math.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import ZIGZAG
from ..errors import CorruptStream
from ..geometry import FrameGeometry, ScanInfo
from ..tables import HuffTable, derive_table
from .lockstep import ScanPlan, build_scan_plan

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

    # Emission keys: mcu<<10 | slot<<6 | pos, +1 so 0 = invalid (slot < 16,
    # pos < 64 -- pow2 fields so placement unpacks with shifts, not divs).
    em_key = jnp.where(write, ((mcu << 4) | slot) * 64 + pos + 1, 0)
    em_val = coef_val

    cur_diff = jnp.where(live & is_dc, coef_val, cur_diff)
    after_coeff = jnp.where(is_dc, 1, new_coeff + 1)
    block_done = live & (is_eob | (after_coeff >= 64))

    # dc_pred[lane, comp]: C is tiny -> one-hot select/update.
    C = int(dc_pred.shape[1])
    comp_oh = comp[:, None] == _iota_row(C)
    pred_here = jnp.where(comp_oh, dc_pred, 0).sum(axis=1, dtype=jnp.int32)
    addw = block_done & block_ok
    ad_key = jnp.where(addw, ((mcu << 4) | slot) * 64 + 1, 0)
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


def _symbol_step_scalar(plan: ScanPlan, nbits, words_t, hv_cols, iota_hv, carry,
                        checks: bool = False):
    """Scalarized symbol step: every intermediate is an [S]-shaped vector.

    The broadcast engine (``_symbol_step``) builds [S,16]/[S,64] one-hot
    matrices; on TPU the minor dimension pads to 128 lanes, so each such
    intermediate is a full [S,128] HBM round trip and the scan runs ~50x
    off the VPU roofline.  Here the small constant axes (16 code lengths,
    T tables, 64 zigzag entries, Wn words) become unrolled Python loops of
    elementwise [S] ops with the plan tables folded in as HLO constants,
    which XLA fuses into single passes over [S].  The 32-bit window is
    carried across steps (w0, w1) and refilled with ONE word-select loop
    per step instead of two.  Only the huffval lookup keeps a 2-D one-hot
    (an MXU matmul).

    Emissions are a SINGLE (key, val) stream (TPU scatter cost is
    proportional to total update slots, valid or not): AC coefficients
    emit on their decode step, and the block's final DC (predictor +
    diff) emits as a one-step-delayed "pending" emission.  The step after
    a block completes is always the next block's DC decode or lane death,
    neither of which emits, so the pending value always finds a free slot
    and decode never stalls.
    """
    (bitpos, alive, mcu, slot, coeff, dc_pred, cur_diff,
     w0, w1, pend_key, pend_val, nsteps) = carry
    # Per-lane consumed-step counter (the +1 pays for the delayed
    # pending-DC flush): feeds the learned per-lane step bounds that the
    # phased narrowed scan sorts lanes by (device_decode).
    nsteps = nsteps + alive
    T = plan.maxcode.shape[0]
    bpm = plan.blocks_per_mcu

    def sl(table):  # per-slot constant lookup (slot < bpm, tiny)
        out = jnp.full_like(slot, int(table[0]))
        for s in range(1, bpm):
            out = jnp.where(slot == s, int(table[s]), out)
        return out

    def tabc(col):  # per-table constant lookup on `tab`
        out = jnp.full_like(tab, int(col[0]))
        for t in range(1, T):
            out = jnp.where(tab == t, int(col[t]), out)
        return out

    # ---- 32-bit window from the carried word pair ----------------------
    r = (bitpos & 31).astype(jnp.uint32)
    win = jnp.where(
        r == 0, w0, (w0 << r) | (w1 >> (jnp.uint32(32) - jnp.maximum(r, 1)))
    )
    code16 = (win >> jnp.uint32(16)).astype(jnp.int32)

    # ---- canonical decode: fused descending loop over code lengths -----
    is_dc = coeff == 0
    tab = jnp.where(is_dc, sl(plan.slot_dc_tab), sl(plan.slot_ac_tab))
    length = jnp.full_like(code16, 16)
    base = jnp.zeros_like(code16)
    minc = jnp.zeros_like(code16)
    any_ok = jnp.zeros_like(alive)
    for l in range(16, 0, -1):
        ok = (code16 >> (16 - l)) <= tabc(plan.maxcode[:, l])
        length = jnp.where(ok, l, length)
        base = jnp.where(ok, tabc(plan.valptr[:, l]), base)
        minc = jnp.where(ok, tabc(plan.mincode[:, l]), minc)
        any_ok = any_ok | ok
    pref_l = code16 >> (16 - length)
    vidx = jnp.clip(base + pref_l - minc, 0, iota_hv.shape[1] - 1)

    # value = huffval[tab, vidx] via a packed-word select chain: pure
    # [S]-shaped ops that fuse into the step's single elementwise pass
    # (a [S, 256] one-hot matmul materializes ~8 MB/step of HBM traffic
    # -- measured as the scan's dominant term -- and narrower one-hots
    # still pad to the 128-lane tile).  hv_cols here is a host tuple of
    # T*vpad/4 ints packing 4 table bytes each.
    wpt = iota_hv.shape[1] // 4  # words per table
    widx_v = tab * wpt + (vidx >> 2)
    packed = jnp.zeros_like(vidx)
    for j, w in enumerate(hv_cols):
        if w:
            packed = jnp.where(widx_v == j, w, packed)
    value = (packed >> ((vidx & 3) * 8)) & 255

    # cat clamped to 16 so the 32-bit window shifts stay in range; the
    # corrupt test uses the raw value (DC categories > 16 kill the lane,
    # same as the NumPy engine).
    cat = jnp.where(is_dc, jnp.minimum(value, 16), value & 15)
    corrupt = (~any_ok) | (is_dc & (value > 16))
    need = length + cat
    overrun = bitpos + need > nbits
    die = (~alive) | corrupt | overrun

    # Window bits [length, length+cat) are the extra bits.
    extra = (
        win >> (jnp.uint32(32) - jnp.minimum(need, 32).astype(jnp.uint32))
    ).astype(jnp.int32) & ((jnp.int32(1) << cat) - 1)
    sign = extra >> jnp.maximum(cat - 1, 0)
    neg = extra - (jnp.int32(1) << cat) + 1
    coef_val = jnp.where(cat == 0, 0, jnp.where(sign != 0, extra, neg))

    # Best-effort NULL-block parity (lane-local MCU; corrupt streams only).
    block_ok = mcu < plan.n_mcus
    comp = sl(plan.slot_comp)
    dc_null = (~die) & is_dc & (~block_ok) & plan.interleaved

    rs = value
    is_eob = (~is_dc) & (rs == 0)
    zrl = jnp.where(is_dc, 0, rs >> 4)
    new_coeff = jnp.where(is_dc, 1, coeff + zrl)
    ac_corrupt = (~die) & (~is_dc) & (~is_eob) & (new_coeff > 63)
    if checks:
        # Sanitizer tier (JPEG_TPU_CHECKS=2, SURVEY §5): the production
        # path silently kills a lane on an invalid symbol (the graceful
        # NULL-block degradation the reference also performs); under the
        # checkified CPU test path that becomes a hard error.  Gated on
        # the symbol FITTING (tail 1-padding legitimately fails the
        # prefix match when fewer than 16 bits remain).
        from jax.experimental import checkify

        fits = bitpos + 16 <= nbits
        bad = alive & fits & (corrupt | ac_corrupt)
        checkify.check(
            ~bad.any(),
            "lockstep sanitizer: live lane hit an invalid Huffman symbol "
            "(bad prefix, DC category > 16, or AC run past 63) -- corrupt "
            "stream or kernel bug",
        )
    die = die | dc_null | ac_corrupt
    live = (~die) & alive

    # AC writes only; the DC value goes out via the pending emission.
    write = live & block_ok & (~is_dc) & (~is_eob)
    nc = jnp.clip(new_coeff, 0, 63)
    zz = jnp.zeros_like(nc)
    for j in range(1, 64):
        zz = jnp.where(nc == j, int(ZIGZAG[j]), zz)

    em_key = jnp.where(write, ((mcu << 4) | slot) * 64 + zz + 1, 0)
    em_val = coef_val
    # Flush last step's pending DC-final (its slot is free by construction).
    em_key = jnp.where(pend_key > 0, pend_key, em_key)
    em_val = jnp.where(pend_key > 0, pend_val, em_val)

    cur_diff = jnp.where(live & is_dc, coef_val, cur_diff)
    after_coeff = jnp.where(is_dc, 1, new_coeff + 1)
    block_done = live & (is_eob | (after_coeff >= 64))

    # dc_pred: one [S] vector per component (C is tiny and static).
    pred_here = dc_pred[0]
    for c in range(1, plan.n_comps):
        pred_here = jnp.where(comp == c, dc_pred[c], pred_here)
    addw = block_done & block_ok
    pend_key = jnp.where(addw, ((mcu << 4) | slot) * 64 + 1, 0)
    pend_val = pred_here + cur_diff
    dc_pred = tuple(
        jnp.where(block_done & (comp == c), pred_here + cur_diff, dc_pred[c])
        for c in range(plan.n_comps)
    )

    next_slot = jnp.where(block_done, slot + 1, slot)
    wrap = next_slot >= bpm
    mcu = jnp.where(live, mcu + (block_done & wrap), mcu)
    slot = jnp.where(live, jnp.where(wrap, 0, next_slot), slot)
    coeff = jnp.where(live, jnp.where(block_done, 0, after_coeff), coeff)
    bitpos = jnp.where(live, bitpos + need, nbits)
    alive = live

    # ---- window refill: at most one 32-bit boundary per symbol ---------
    # (need <= 32, so widx advances by 0 or 1 for live lanes; dead lanes'
    # windows are never read again.)
    widx_new = bitpos >> 5
    crossed = widx_new != ((bitpos - need) >> 5)  # pre-advance widx
    tgt = widx_new + 1
    fetched = jnp.zeros_like(w1)
    for j in range(words_t.shape[0]):
        fetched = jnp.where(tgt == j, words_t[j], fetched)
    w0 = jnp.where(crossed, w1, w0)
    w1 = jnp.where(crossed, fetched, w1)

    carry = (bitpos, alive, mcu, slot, coeff, dc_pred, cur_diff,
             w0, w1, pend_key, pend_val, nsteps)
    return carry, (em_key, em_val)


def _hv_consts(plan: ScanPlan):
    """Packed huffval constants for the select-chain lookup: hv_words
    [T * vpad/4] int32 host tuple, word t*(vpad/4) + (v>>2) packing
    huffval[t, v] at byte v&3; iota_hv carries the padded table width.

    Rationale (measured): a [S, 256] bf16 one-hot matmul materializes
    ~8 MB/step of HBM traffic and dominated the scan; a [S, 16] nibble
    split does NOT help because a 16-wide minor axis still pads to the
    128-lane tile.  A pure [S]-shaped select chain over the packed
    words keeps everything inside the fused elementwise pass."""
    vpad = ((plan.max_codes + 3) // 4) * 4
    hv = plan.huffval[:, :vpad].astype(np.int64)
    words = (
        hv[:, 0::4]
        | (hv[:, 1::4] << 8)
        | (hv[:, 2::4] << 16)
        | (hv[:, 3::4] << 24)
    ).reshape(-1)
    words = np.where(words >= 1 << 31, words - (1 << 32), words)  # i32
    return (tuple(int(w) for w in words),
            jnp.arange(vpad, dtype=jnp.int32)[None, :])


def _scan_lanes(plan: ScanPlan, words, nbits, max_steps: int,
                checks: bool = False):
    """Run the lockstep symbol scan over all lanes (no placement).

    Returns (mcu_counts [S], (em_key, em_val) [steps, S], starved,
    nsteps [S] -- per-lane consumed steps, the signal the learned-bound
    phased scan sorts on).  Split out so cross-chip callers can inject
    global placement offsets (parallel/sharding).  ``checks`` arms the
    checkify sanitizer tier (JPEG_TPU_CHECKS=2): callers must then run
    the program under ``checkify.checkify``.
    """
    S = words.shape[0]
    words_t = words.T  # [Wn, S]: refill loop reads contiguous rows
    hv_cols, iota_hv = _hv_consts(plan)

    z = jnp.zeros(S, jnp.int32)
    init = (
        z,
        nbits > 0,
        z,
        z,
        z,
        tuple(z for _ in range(plan.n_comps)),
        z,
        words_t[0],
        words_t[1],
        z,
        z,
        z,  # nsteps
    )

    def step(carry, _):
        return _symbol_step_scalar(plan, nbits, words_t, hv_cols, iota_hv,
                                   carry, checks=checks)

    carry, (em_key, em_val) = jax.lax.scan(
        step, init, None, length=max_steps, unroll=UNROLL
    )
    # True when some lane still had symbols left: the caller's optimistic
    # step bound was too small and must retry with a larger one.
    return carry[2], (em_key, em_val), carry[1].any(), carry[11]


def _scan_lanes_phased(plan: ScanPlan, words, nbits, phases):
    """Lockstep scan with static lane NARROWING between phases.

    ``phases`` = ((n_0, t_0), (n_1, t_1), ...) with n_0 = S and n_p
    strictly decreasing: phase p runs t_p steps over the FIRST n_p lane
    columns, continuing the sliced carry.  Lanes must arrive sorted by
    predicted symbol count DESCENDING (device_decode learns the counts
    from an earlier chunk of the stream and orders rows at native-prep
    time), so short lanes finish in the early phases and the placement
    scatter's attempts shrink from S x max_steps toward the true symbol
    count.  A lane that leaves the lane set while still alive (or with
    an unflushed pending-DC emission) marks the scan starved -- callers
    retry on the classic single-phase path.

    Returns (mcu_counts [S], [(em_key, em_val), ...] one per phase,
    starved, nsteps [S]) with per-lane outputs in the SORTED order.
    """
    S = words.shape[0]
    words_t = words.T
    hv_cols, iota_hv = _hv_consts(plan)

    z = jnp.zeros(S, jnp.int32)
    carry = (
        z,
        nbits > 0,
        z,
        z,
        z,
        tuple(z for _ in range(plan.n_comps)),
        z,
        words_t[0],
        words_t[1],
        z,
        z,
        z,
    )
    streams = []
    tails = []  # (counts, nsteps) of lanes retired after each phase
    starved = jnp.asarray(False)
    for p, (n_p, t_p) in enumerate(phases):
        if p > 0:
            carry = jax.tree_util.tree_map(lambda x: x[:n_p], carry)
        wt = words_t[:, :n_p]
        nb = nbits[:n_p]

        def step(c, _, wt=wt, nb=nb):
            return _symbol_step_scalar(plan, nb, wt, hv_cols, iota_hv, c)

        carry, (ek, ev) = jax.lax.scan(
            step, carry, None, length=t_p, unroll=UNROLL
        )
        streams.append((ek, ev))
        n_next = phases[p + 1][0] if p + 1 < len(phases) else 0
        # lanes [n_next, n_p) retire here: alive or unflushed pending-DC
        # means the phase budget starved them
        starved = starved | (
            carry[1][n_next:] | (carry[9][n_next:] > 0)
        ).any()
        tails.append((carry[2][n_next:], carry[11][n_next:]))
    counts = jnp.concatenate([t[0] for t in reversed(tails)])
    nsteps = jnp.concatenate([t[1] for t in reversed(tails)])
    return counts, streams, starved, nsteps


@partial(
    jax.jit,
    static_argnames=("plan", "max_steps", "total_blocks", "frames",
                     "segs_per_frame", "checks"),
)
def decode_scan_device(
    plan: ScanPlan,
    words: jnp.ndarray,  # [S, Wn] uint32 big-endian segment words
    nbits: jnp.ndarray,  # [S] int32
    max_steps: int,
    total_blocks: int,  # blocks per frame
    frames: int = 1,
    segs_per_frame: int = 0,  # 0 -> S (single frame)
    checks: bool = False,  # checkify sanitizer tier (JPEG_TPU_CHECKS=2)
):
    """On-device scan decode -> (counts[S], coeffs[frames*total_blocks, 64]).

    With frames > 1, lanes are grouped per frame (segs_per_frame each) and
    MCU prefix sums reset per frame -- the Motion-JPEG batch path.
    """
    S = words.shape[0]
    spf = segs_per_frame or S
    mcu_counts, (em_key, em_val), starved, _ = _scan_lanes(
        plan, words, nbits, max_steps, checks=checks
    )
    coeffs = _place_emissions(
        plan, mcu_counts, [(em_key, em_val)], frames, spf, total_blocks,
        checks=checks,
    )
    return mcu_counts, coeffs, starved


def _place_emissions(
    plan, mcu_counts, streams, frames, spf, total_blocks, seg_offset=None,
    checks: bool = False, perm=None, combine: Optional[str] = None,
):
    """Global placement: prefix-sum of per-lane MCU counts + flat scatters.

    Keys pack (mcu, slot, pos) in pow2 fields so unpacking is shifts/masks.
    Per-lane quantities broadcast along the step axis (never gathered), and
    the per-slot block-index affinities collapse to three fused constants
    c0 + my*c1 + mx*c2 so the [steps, S] index math is a handful of
    elementwise ops plus one divmod by m_x.

    ``perm`` (sorted-lane -> original-lane map) supports the phased
    narrowed scan: per-lane inputs/outputs are then in SORTED order and
    streams may be NARROWER than S (a prefix of the sorted lanes).
    ``combine`` forces "set"/"add"; default: set for a single stream
    (write-once slots, measured 1.56x over add on v5e), add otherwise --
    the phased path passes "set" because its streams stay write-once.
    """
    S = mcu_counts.shape[0]
    if perm is not None:
        counts_orig = jnp.zeros_like(mcu_counts).at[perm].set(mcu_counts)
        pf = counts_orig.reshape(frames, spf)
        seg_off_orig = (jnp.cumsum(pf, axis=1) - pf).reshape(S)
        seg_offset = jnp.take(seg_off_orig, perm)
        frame_base = (perm // spf) * total_blocks
    else:
        if seg_offset is None:
            per_frame = mcu_counts.reshape(frames, spf)
            seg_offset = (
                jnp.cumsum(per_frame, axis=1) - per_frame
            ).reshape(S)
        # [1, S] rows broadcast over steps; frame base folds into seg base.
        frame_base = (jnp.arange(S, dtype=jnp.int32) // spf) * total_blocks

    bpm = plan.blocks_per_mcu
    if plan.interleaved:
        c0 = (plan.slot_plane_offset + plan.slot_v * plan.slot_bx + plan.slot_h).astype(np.int64)
        c1 = (plan.slot_V * plan.slot_bx).astype(np.int64)
        c2 = plan.slot_H.astype(np.int64)
    else:
        c0 = (plan.slot_plane_offset + plan.slot_h).astype(np.int64)
        c1 = c2 = None
    nb = plan.slot_nblocks.astype(np.int64)
    po = plan.slot_plane_offset.astype(np.int64)

    def slotc(col, slot):
        out = jnp.full_like(slot, int(col[0]))
        for s in range(1, bpm):
            out = jnp.where(slot == s, int(col[s]), out)
        return out

    def place(keys):
        w = keys.shape[1]  # stream width (<= S for narrowed phases)
        kk = keys - 1  # invalid -> -1
        pos = kk & 63
        slot = (kk >> 6) & 15
        local_mcu = kk >> 10
        gmcu = local_mcu + seg_offset[None, :w]
        if plan.interleaved:
            my = gmcu // plan.m_x
            mx = gmcu - my * plan.m_x
            seq = my * slotc(c1, slot) + mx * slotc(c2, slot) + slotc(c0, slot)
            blk = seq
            seq = seq - slotc(po, slot)
        else:
            seq = gmcu * bpm + slotc(c0 - po, slot)
            blk = seq + slotc(po, slot)
        good = (keys > 0) & (seq < slotc(nb, slot))
        flat = (frame_base[None, :w] + blk) * 64 + pos
        if checks:
            # Sanitizer tier: the production scatter silently DROPS any
            # out-of-range write (mode="drop") -- correct for the
            # reference's NULL-block semantics but also the exact place
            # a placement bug would hide.  Checkified, every valid-key
            # emission must land in bounds.
            from jax.experimental import checkify

            inb = (flat >= 0) & (flat < frames * total_blocks * 64)
            checkify.check(
                (~good | inb).all(),
                "lockstep sanitizer: coefficient placement out of bounds "
                "(kernel bug)",
            )
        # Invalid -> one-past-the-end (positive OOB is dropped; negative
        # indices would WRAP under numpy indexing semantics).
        oob = frames * total_blocks * 64
        return jnp.where(good, flat, oob).reshape(-1)

    mode = combine or ("set" if len(streams) == 1 else "add")
    out = jnp.zeros(frames * total_blocks * 64, dtype=jnp.int32)
    for keys, vals in streams:
        if mode == "set":
            # Single-writer streams (the production scan, speculative,
            # and every phase of the narrowed scan): one writer per
            # coefficient slot, the pending-DC emission owns pos 0 --
            # scatter-SET applies: measured 1.56x faster than
            # scatter-ADD on v5e (6.8 vs 10.6 ns/attempt), and this
            # scatter dominates decode placement.
            out = out.at[place(keys)].set(vals.reshape(-1), mode="drop")
        else:
            # Two-stream form (Pallas engine): the DC slot receives the
            # raw diff from one stream and the predictor from the other,
            # so the combine must ADD.
            out = out.at[place(keys)].add(vals.reshape(-1), mode="drop")
    return out.reshape(frames * total_blocks, 64)


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
    blocks = (ri if ri else max(plan.n_mcus, 1)) * plan.blocks_per_mcu
    # Hard bound: one symbol consumes >= 1 bit; <= 65 symbols per block
    # (+ slack for trailing-padding garbage the reference also decodes);
    # +2 for the death step and the delayed pending-DC flush.
    bound = min(max_nbits + 2, 65 * (blocks + 2) + 2)
    if optimistic:
        # Long segments are dense content with many extra bits per symbol,
        # so bits/symbol GROWS with segment length -- real lanes average
        # well over 3 bits/symbol, plus ~1 symbol (EOB) per block floor.
        # Aggressive by design: a starved decode retries one 128-step
        # bucket up (``_grow_steps``) and DeviceDecoder remembers the
        # learned bound across batches of a stream.
        est = blocks + max_nbits // 6 + 16
        steps = max(128, min(bound, est))
        return max(128, steps // 128 * 128)
    steps = max(64, bound)
    return 1 << (steps - 1).bit_length()


def _grow_steps(max_steps: int, hard_cap: int) -> int:
    """Next starvation-retry bound: +50%, 128-step buckets, capped."""
    return min(hard_cap, (max_steps * 3 // 2 + 127) // 128 * 128)


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
    if plan.blocks_per_mcu > 16:
        # The emission key packs the slot into 4 bits; T.81-valid streams
        # have bpm<=16 but the parser doesn't bound H/V nibbles, and the
        # reference still decodes such streams (decoder.c:303-359).  Keep
        # the "parallel engines deviate only on invalid input" contract
        # explicit by routing oversized plans to the serial oracle.
        from .serial import decode_scan_serial

        return decode_scan_serial(geom, info, tables, segments, planes)
    words, nbits = _segments_to_words(segments)
    total_blocks = sum(geom.by_id(cid).n_blocks for cid in info.component_ids)
    max_steps = _max_steps_for(nbits, plan, ri)
    hard_cap = _max_steps_for(nbits, plan, ri, optimistic=False)

    from ..api import checks_level

    checks = checks_level() >= 2
    while True:
        if checks:
            # JPEG_TPU_CHECKS=2 (SURVEY §5 sanitizer row): run the scan +
            # placement under jax.experimental.checkify so in-kernel
            # invariant violations (invalid symbol on a live lane, OOB
            # placement) raise instead of degrading silently.  CPU test
            # tier -- the production path never pays for the checks.
            from jax.experimental import checkify

            err, (counts, coeffs, starved) = checkify.checkify(
                lambda w, nb: decode_scan_device(
                    plan, w, nb, max_steps, total_blocks, checks=True
                ),
                errors=checkify.user_checks,
            )(jnp.asarray(words), jnp.asarray(nbits, dtype=jnp.int32))
            try:
                err.throw()
            except Exception as e:
                raise CorruptStream(f"sanitizer: {e}") from e
        else:
            counts, coeffs, starved = decode_scan_device(
                plan,
                jnp.asarray(words),
                jnp.asarray(nbits, dtype=jnp.int32),
                max_steps,
                total_blocks,
            )
        if not bool(starved) or max_steps >= hard_cap:
            break
        max_steps = _grow_steps(max_steps, hard_cap)
    coeffs = np.asarray(coeffs)
    off = 0
    for cid in info.component_ids:
        n = geom.by_id(cid).n_blocks
        planes[cid][:] = coeffs[off : off + n]
        off += n
    return int(np.asarray(counts).sum())
