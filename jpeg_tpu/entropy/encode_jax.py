"""Device-side entropy encoding: quantized blocks -> packed ECS bits.

The JAX port of ``entropy/encode.py``'s flat-symbol design, fully jittable
so the encoder's hot path (symbolize + histogram + bit-pack) can run on
the TPU next to the dense stage:

  * symbolization uses a FIXED per-block symbol layout [B, 68] (1 DC + up
    to 63 AC + up to 3 ZRL + 1 EOB can never exceed 68 slots) with a
    validity mask -- static shapes, no ragged structures;
  * within-block symbol positions come from an exclusive cumsum of
    per-coefficient symbol counts; ZRL slots are written by three masked
    scatters (a run of g zeros emits g//16 <= 3 ZRLs);
  * bit packing is one exclusive cumsum of item bit-lengths plus two
    scatter-ADDs per item into a u32 word array (items never share bits,
    so add == or);
  * the dry-pass histogram is a one-hot matmul reduction (the psum-able
    analog of write_block_dry).

Byte stuffing and marker assembly stay on the host (they're O(bytes) and
inherently byte-serial); restart intervals pack per segment by running
this per interval slice.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np


def encode_cat_jax(c):
    """Category (bit length of |c|), elementwise (coeffs.c:56-74)."""
    mag = jnp.abs(c)
    # bit_length via comparisons: cat = sum(mag >= 2^k) for k=0..15
    thresholds = jnp.asarray([1 << k for k in range(16)], dtype=c.dtype)
    return (mag[..., None] >= thresholds).sum(axis=-1).astype(jnp.int32)


def symbolize_blocks_jax(zz):
    """Zig-zag-ordered blocks [B, 64] -> fixed symbol layout.

    Returns (sym [B,68] uint8-ish int32, extra_val [B,68], extra_len
    [B,68], valid [B,68], n_sym [B]).  DC symbols carry the *diff* already
    (caller applies differential coding before this).
    """
    b = zz.shape[0]
    dc = zz[:, 0]
    acs = zz[:, 1:]  # [B, 63]
    nz = acs != 0

    # Gap before each AC position: zeros since the previous nonzero.
    # run_before[i] = i - prev_nz_index(i) - 1, computed with a cumsum
    # trick: idx of last nz at-or-before each position.
    pos = jnp.arange(1, 64)[None, :]
    last_nz = jax.lax.cummax(jnp.where(nz, pos, 0), axis=1)
    prev_nz = jnp.concatenate(
        [jnp.zeros((b, 1), last_nz.dtype), last_nz[:, :-1]], axis=1
    )
    gap = pos - prev_nz - 1  # zeros preceding position i
    n_zrl = jnp.where(nz, gap // 16, 0)
    run = jnp.where(nz, gap % 16, 0)

    # Per-position symbol count (ZRLs + the coefficient symbol itself).
    per_pos = jnp.where(nz, n_zrl + 1, 0)  # [B, 63]
    # Slot of each position's (run,cat) symbol: 1 (DC) + cumsum - 1 ... the
    # symbol goes after its ZRLs.
    cum = jnp.cumsum(per_pos, axis=1)
    sym_slot = 1 + cum - 1  # inclusive cumsum -> slot of the coefficient
    zrl_base = sym_slot - n_zrl  # first ZRL slot

    has_any = nz.any(axis=1)
    last_pos = last_nz[:, -1]
    eob = ~(has_any & (last_pos == 63))
    n_sym = 1 + cum[:, -1] + eob.astype(cum.dtype)

    cat = encode_cat_jax(acs)
    sym_val = (run.astype(jnp.int32) << 4) | cat
    adj = jnp.where(acs < 0, acs - 1, acs)
    extra = (adj & ((jnp.int32(1) << cat) - 1)).astype(jnp.int32)

    n_slots = 68
    sym = jnp.zeros((b, n_slots), jnp.int32)
    ext_v = jnp.zeros((b, n_slots), jnp.int32)
    ext_l = jnp.zeros((b, n_slots), jnp.int32)

    # DC at slot 0.
    dcat = encode_cat_jax(dc)
    dadj = jnp.where(dc < 0, dc - 1, dc)
    sym = sym.at[:, 0].set(dcat)
    ext_v = ext_v.at[:, 0].set((dadj & ((jnp.int32(1) << dcat) - 1)).astype(jnp.int32))
    ext_l = ext_l.at[:, 0].set(dcat)

    rows = jnp.broadcast_to(jnp.arange(b)[:, None], (b, 63))
    slot_c = jnp.where(nz, sym_slot, n_slots)  # invalid -> dropped
    sym = sym.at[rows, slot_c].set(sym_val, mode="drop")
    ext_v = ext_v.at[rows, slot_c].set(extra, mode="drop")
    ext_l = ext_l.at[rows, slot_c].set(cat, mode="drop")

    # ZRL symbols (0xF0, no extras): up to 3 per coefficient.
    for zi in range(3):
        slot_z = jnp.where(nz & (n_zrl > zi), zrl_base + zi, n_slots)
        sym = sym.at[rows, slot_z].set(0xF0, mode="drop")

    # EOB (symbol 0) at slot n_sym-1 where flagged.
    eob_slot = jnp.where(eob, n_sym - 1, n_slots)
    sym = sym.at[jnp.arange(b), eob_slot].set(0, mode="drop")

    valid = jnp.arange(n_slots)[None, :] < n_sym[:, None]
    return sym, ext_v, ext_l, valid, n_sym


def histogram_jax(sym, valid, n_bins: int = 256):
    """Symbol frequency histogram (the dry pass) as a one-hot reduction."""
    oh = (sym[..., None] == jnp.arange(n_bins)[None, None, :]) & valid[..., None]
    return oh.sum(axis=(0, 1)).astype(jnp.int32)


def pack_bits_jax(item_val, item_len, total_words: int):
    """Flat items (MSB-first values, bit lengths; len 0 = skip) -> u32 words.

    Bit offsets come from an exclusive cumsum; each item's bits land in at
    most two words via scatter-ADD (bit-disjoint, so add == or).
    Returns (words [total_words] uint32, total_bits).
    """
    off = jnp.cumsum(item_len) - item_len
    total_bits = off[-1] + item_len[-1] if item_len.size else jnp.int32(0)

    word_idx = off >> 5
    bit_in = (off & 31).astype(jnp.uint32)
    v = item_val.astype(jnp.uint32)
    ln = item_len.astype(jnp.uint32)

    # Left-align the value within a 64-bit straddle [word, word+1]:
    # bits occupy [bit_in, bit_in+len).  hi gets the first 32-bit_in bits.
    shift_hi = jnp.minimum(bit_in + ln, 32)
    hi = jnp.where(
        ln > 0,
        jnp.where(
            bit_in + ln <= 32,
            v << (32 - bit_in - ln),
            v >> (bit_in + ln - 32),
        ),
        0,
    ).astype(jnp.uint32)
    lo_bits = jnp.where(bit_in + ln > 32, bit_in + ln - 32, 0)
    lo = jnp.where(lo_bits > 0, v << (32 - lo_bits), 0).astype(jnp.uint32)

    words = jnp.zeros(total_words, jnp.uint32)
    words = words.at[word_idx].add(hi, mode="drop")
    words = words.at[word_idx + 1].add(lo, mode="drop")
    return words, total_bits


def pack_scan_segments_jax(
    item_val,  # [N] int32 flat items in bitstream order (len 0 = skip)
    item_len,  # [N] int32
    seg_id,  # [N] int32 nondecreasing segment index per item
    n_segments: int,
    words_per_seg: int,
    seg_bits=None,  # precomputed [n_segments] bit totals (skips the
    #                 N-sized segment_sum when the caller knows them)
):
    """Segmented bit packing: one cumsum + two scatter-ADDs total.

    Each restart segment's bitstream starts at its own offset 0
    (byte-aligned flush happens host-side in finalize_segment).  Returns
    (words [n_segments, words_per_seg] uint32, seg_bits [n_segments]).
    """
    glob = jnp.cumsum(item_len) - item_len
    if seg_bits is None:
        seg_bits = jax.ops.segment_sum(
            item_len, seg_id, num_segments=n_segments
        )
    seg_start = jnp.cumsum(seg_bits) - seg_bits
    off = glob - seg_start[seg_id]

    word_idx = seg_id * words_per_seg + (off >> 5)
    bit_in = (off & 31).astype(jnp.uint32)
    v = item_val.astype(jnp.uint32)
    ln = item_len.astype(jnp.uint32)

    shift_hi = 32 - jnp.minimum(bit_in + ln, 32)
    hi = jnp.where(
        ln > 0,
        jnp.where(
            bit_in + ln <= 32,
            v << (32 - bit_in - ln),
            v >> (bit_in + ln - 32),
        ),
        0,
    ).astype(jnp.uint32)
    lo_bits = jnp.where(bit_in + ln > 32, bit_in + ln - 32, 0)
    lo = jnp.where(lo_bits > 0, v << (32 - lo_bits), 0).astype(jnp.uint32)

    flat = jnp.zeros(n_segments * words_per_seg, jnp.uint32)
    flat = flat.at[word_idx].add(hi, mode="drop")
    # the straddle word may cross into the next segment's row only for
    # invalid (len 0) items, which contribute 0 anyway
    flat = flat.at[word_idx + 1].add(lo, mode="drop")
    return flat.reshape(n_segments, words_per_seg), seg_bits


@partial(jax.jit, static_argnames=("n_segments", "words_per_seg"))
def encode_scan_device(
    zz,  # [N_blocks, 64] int32 zig-zag blocks, DC already differential,
    #      in bitstream (visit) order
    dc_tab,  # [N_blocks] int32: row into ehufco/ehufsi for DC symbols
    ac_tab,  # [N_blocks] int32: row for AC symbols
    ehufco,  # [T, 256] int32
    ehufsi,  # [T, 256] int32
    seg_of_block,  # [N_blocks] int32 nondecreasing
    n_segments: int,
    words_per_seg: int,
):
    """Full device entropy encode: blocks -> packed segment words.

    Returns (words [n_segments, words_per_seg] u32, seg_bits [n_segments],
    hist [T, 256] symbol histogram for the dry pass).
    """
    sym, ext_v, ext_l, valid, _ = symbolize_blocks_jax(zz)
    nb, ns = sym.shape

    is_dc = jnp.zeros((nb, ns), bool).at[:, 0].set(True)
    tab = jnp.where(is_dc, dc_tab[:, None], ac_tab[:, None])

    # (code, size) via one-hot matmul; f32 holds integers <= 2^24 exactly.
    T = ehufco.shape[0]
    oh = (sym[..., None] == jnp.arange(256)[None, None, :]).astype(jnp.float32)
    both = jnp.concatenate(
        [ehufco.astype(jnp.float32).T, ehufsi.astype(jnp.float32).T], axis=1
    )  # [256, 2T]
    picked = jnp.einsum(
        "bsk,kt->bst", oh, both, precision="highest",
        preferred_element_type=jnp.float32,
    )
    code = jnp.zeros((nb, ns), jnp.int32)
    size = jnp.zeros((nb, ns), jnp.int32)
    for t in range(T):
        sel = tab == t
        code = jnp.where(sel, picked[:, :, t].astype(jnp.int32), code)
        size = jnp.where(sel, picked[:, :, T + t].astype(jnp.int32), size)

    item_val = (code << ext_l) | ext_v
    item_len = jnp.where(valid, size + ext_l, 0)

    # Per-table symbol histogram (dry pass) from the same one-hot.
    hist = jnp.zeros((T, 256), jnp.int32)
    for t in range(T):
        sel = (tab == t) & valid
        hist = hist.at[t].add(
            (oh * sel[..., None]).sum(axis=(0, 1)).astype(jnp.int32)
        )

    seg_id = jnp.broadcast_to(seg_of_block[:, None], (nb, ns)).reshape(-1)
    words, seg_bits = pack_scan_segments_jax(
        item_val.reshape(-1),
        item_len.reshape(-1),
        seg_id,
        n_segments,
        words_per_seg,
    )
    return words, seg_bits, hist


def _exclusive_cumsum(x):
    c = jnp.cumsum(x)
    return c - x


@partial(
    jax.jit,
    static_argnames=(
        "n_segments", "words_per_seg", "items_cap", "nz_cap", "with_hist",
    ),
)
def encode_scan_device2(
    zz,  # [B, 64] int32 zig-zag blocks, DC already differential; row order
    #      is arbitrary ("natural") -- `order` gives the bitstream order
    dc_tab,  # [B] int32, bitstream order
    ac_tab,  # [B] int32, bitstream order
    ehufco,  # [T, 256] int32
    ehufsi,  # [T, 256] int32
    seg_of_block,  # [B] int32 nondecreasing, bitstream order
    n_segments: int,
    words_per_seg: int,
    items_cap: int,
    order=None,  # [B] int32: bitstream position -> zz row; None = identity.
    #      Per-block math runs in natural order; only the small [B] vectors
    #      permute, so no [B, 64] gather is ever materialized.
    nz_cap: int = 63,  # static bound on nonzero AC coefficients per block:
    #      the range-start mark scatter only attempts the first nz_cap
    #      sorted columns (scatter cost ~ attempts).  Blocks with more
    #      nonzeros raise the overflow flag; callers retry larger.
    with_hist: bool = False,  # also return the per-table symbol histogram
    #      (the dry pass of the K.2 optimizer, encoder.c:525-558) as one
    #      MXU reduction over the compact item stream.
):
    """Scatter-minimal device entropy encode.

    v1 (``encode_scan_device``) builds a [B, 68] symbol grid with ~6
    scatters over [B, 63] update grids and bit-packs every grid slot --
    TPU scatter cost is proportional to ATTEMPTED updates, so the mostly
    invalid slots dominate.  Here the only scatters are two B-sized
    "mark" scatters (for the rank->block inverse maps) and the two
    bit-pack scatter-ADDs over the COMPACT item stream:

      1. per block, sort AC positions so nonzeros lead (one lax.sort of
         the [B, 63] minor axis -- no scatter);
      2. item counts per block (DC + per-nonzero ZRLs+symbol + EOB) give
         an exclusive cumsum ``base``; a mark/cumsum inverse maps each
         compact item index -> (block, slot);
      3. each item resolves elementwise to (symbol, extra) via the sorted
         nonzero table; (code, size) comes from ONE one-hot bf16 matmul
         with the code tables split into exact-in-bf16 lo/hi bytes;
      4. segmented bit offsets = one cumsum; two scatter-ADDs place each
         item's <=32 bits into its segment's u32 words.

    Returns (words [n_segments, words_per_seg] u32, seg_bits, overflow,
    missing): ``overflow`` = items_cap or words_per_seg too small (caller
    retries larger), ``missing`` = some symbol has no code in its table.
    """
    if n_segments > (1 << 17):
        # t_meta packs seg_of_block into 17 bits below; wrapping would
        # silently corrupt the tab/eob/n_sym fields too.  n_segments is
        # static, so this check is free (trace-time).  DeviceEncoder caps
        # its chunk size to stay under this.
        raise ValueError(
            f"n_segments={n_segments} exceeds the 2^17 packing limit of "
            "encode_scan_device2; split the batch into smaller chunks"
        )
    b = zz.shape[0]
    dc = zz[:, 0]
    acs = zz[:, 1:]  # [B, 63]
    nz = acs != 0

    # ---- per-position run/ZRL structure (elementwise) ------------------
    pos = jnp.arange(1, 64, dtype=jnp.int32)[None, :]
    last_nz = jax.lax.cummax(jnp.where(nz, pos, 0), axis=1)
    prev_nz = jnp.concatenate(
        [jnp.zeros((b, 1), last_nz.dtype), last_nz[:, :-1]], axis=1
    )
    gap = pos - prev_nz - 1
    n_zrl = jnp.where(nz, gap // 16, 0)  # [B, 63]
    run = jnp.where(nz, gap % 16, 0)

    cat = encode_cat_jax(acs)
    adj = jnp.where(acs < 0, acs - 1, acs)
    extra = (adj & ((jnp.int32(1) << cat) - 1)).astype(jnp.int32)

    # ---- bring nonzeros to the front of each row (sort, no scatter) ----
    # key: nonzeros keep their position order, zeros sink to the back.
    # Payload packs (n_zrl:2 | sym:8 | cat:5 | extra:16) into one i32 so
    # the sort moves a single value alongside the key.
    key = jnp.where(nz, pos, jnp.int32(64))
    sym_rs = ((run << 4) | cat).astype(jnp.int32)
    payload = (n_zrl << 29) | (sym_rs << 21) | (cat << 16) | (extra & 0xFFFF)
    _, s_pay = jax.lax.sort((key, payload), dimension=1, num_keys=1)
    s_nzrl = s_pay >> 29
    n_nz = nz.sum(axis=1).astype(jnp.int32)  # [B]

    # items of nonzero j: its ZRLs then its symbol -> cumulative slots.
    items_of_nz = s_nzrl + 1  # [B, 63] (garbage past n_nz, masked below)
    j_iota = jnp.arange(63, dtype=jnp.int32)[None, :]
    nz_valid = j_iota < n_nz[:, None]
    items_of_nz = jnp.where(nz_valid, items_of_nz, 0)
    nz_cum = jnp.cumsum(items_of_nz, axis=1)  # inclusive
    nz_slot_end = 1 + nz_cum  # symbol slot of nonzero j is nz_slot_end-1

    has_any = n_nz > 0
    ends_at_63 = has_any & (last_nz[:, -1] == 63)
    eob = ~ends_at_63
    n_sym = 1 + nz_cum[:, -1] + eob.astype(jnp.int32)  # [B]

    # ---- compact item stream: inverse map via mark/cumsum --------------
    # Per-item gathers dominate this stage (~10 ns/element on v5e), so
    # per-block values are packed into THREE [B] tables read with one
    # take each, block starts come from a cummax instead of take(base),
    # and symbol-vs-ZRL classification uses the NEXT item's boundary
    # flags (pure shifts) instead of a nz_cum gather.
    if order is None:
        order = jnp.arange(b, dtype=jnp.int32)
        n_sym_v = n_sym
        base_nat = None
    else:
        n_sym_v = jnp.take(n_sym, order)
        inv_order = (
            jnp.zeros(b, jnp.int32)
            .at[order]
            .set(jnp.arange(b, dtype=jnp.int32))
        )
    base = _exclusive_cumsum(n_sym_v)  # [B] bitstream order
    base_nat = base if n_sym_v is n_sym else jnp.take(base, inv_order)
    total = base[-1] + n_sym_v[-1]
    overflow_items = total > items_cap

    # Per-block packed tables ([B]-sized ops are cheap):
    eob_v = jnp.take(eob, order)
    dcv_v = jnp.take(dc, order)
    dcat_v = encode_cat_jax(dcv_v)
    dadj_v = jnp.where(dcv_v < 0, dcv_v - 1, dcv_v)
    dext_v = (dadj_v & ((jnp.int32(1) << dcat_v) - 1)).astype(jnp.int32)
    t_flat = order * 63  # flat row base into the sorted [B, 63] tables
    t_meta = (
        (((n_sym_v << 1) | eob_v.astype(jnp.int32)) << 3 | dc_tab) << 3
        | ac_tab
    ) << 17 | seg_of_block  # n_sym:7 | eob:1 | tabs:3+3 | seg:17

    mark = jnp.zeros(items_cap, jnp.int32).at[base].add(1, mode="drop")
    b_of = jnp.cumsum(mark) - 1  # [N] bitstream block position of each item
    i_iota = jnp.arange(items_cap, dtype=jnp.int32)
    startpos = jax.lax.cummax(jnp.where(mark > 0, i_iota, 0))
    slot = i_iota - startpos
    item_valid = i_iota < total

    flatbase = jnp.take(t_flat, b_of, mode="clip")
    meta = jnp.take(t_meta, b_of, mode="clip")
    # DC values are read ONLY at block-start slots (is_dc <=> i == start),
    # so a B-sized scatter replaces a per-item gather.
    dcpk = jnp.zeros(items_cap, jnp.int32).at[base].set(
        (dcat_v << 17) | dext_v, mode="drop"
    )
    seg_id = meta & 0x1FFFF
    ac_tab_i = (meta >> 17) & 7
    dc_tab_i = (meta >> 20) & 7
    eobf = (meta >> 23) & 1
    n_sym_i = meta >> 24
    dcat = dcpk >> 17
    dext = dcpk & 0x1FFFF

    # second mark/cumsum INSIDE blocks: slot -> nonzero ordinal j.
    # nz j occupies slots [1 + nz_cum[j-1], 1 + nz_cum[j]); mark the start
    # of each nonzero's slot range in the compact stream.  (A gather-based
    # nonzero pre-compaction was tried to shrink this scatter's attempts
    # and measured no better -- its extra per-item gathers cost what the
    # dropped scatter attempts saved.)
    nz_start_flat = jnp.where(
        nz_valid, base_nat[:, None] + (nz_slot_end - items_of_nz), items_cap
    )[:, :nz_cap]
    markj = jnp.zeros(items_cap, jnp.int32).at[nz_start_flat.reshape(-1)].add(
        1, mode="drop"
    )
    cj = jnp.cumsum(markj)  # inclusive count of range starts
    # cj at the block base counts exactly the ranges of earlier blocks
    # (base slots hold DC symbols, never range starts); cj is
    # nondecreasing so a masked cummax replaces a double gather.
    cj_at_base = jax.lax.cummax(jnp.where(mark > 0, cj, 0))
    j_in_block = cj - cj_at_base - 1  # ordinal of the range item i is in

    is_dc = slot == 0
    is_eob_slot = item_valid & (~is_dc) & (eobf == 1) & (slot == n_sym_i - 1)
    # Within a range, the LAST slot is the (run,size) symbol; an item is
    # that last slot iff the NEXT item opens a range, opens a block, is
    # the EOB slot, or falls past the stream end.
    nxt = jnp.concatenate([(mark + markj)[1:], jnp.ones(1, jnp.int32)])
    next_boundary = (nxt > 0) | (i_iota + 1 >= total)
    next_is_eob = (eobf == 1) & (slot + 1 == n_sym_i - 1)
    is_sym_slot = (
        item_valid & (~is_dc) & (~is_eob_slot) & (next_boundary | next_is_eob)
    )

    flatj = flatbase + jnp.clip(j_in_block, 0, 62)
    pay_j = jnp.take(s_pay.reshape(-1), flatj, mode="clip")
    sym_j = (pay_j >> 21) & 0xFF
    cat_j = (pay_j >> 16) & 0x1F
    ext_j = pay_j & 0xFFFF

    sym = jnp.where(is_dc, dcat, jnp.where(is_eob_slot, 0,
                    jnp.where(is_sym_slot, sym_j, 0xF0)))
    ext_l = jnp.where(is_dc, dcat, jnp.where(is_sym_slot, cat_j, 0))
    ext_v = jnp.where(is_dc, dext, jnp.where(is_sym_slot, ext_j, 0))

    # ---- (code, size): one bf16 one-hot matmul, lo/hi split ------------
    T = ehufco.shape[0]
    tab = jnp.where(is_dc, dc_tab_i, ac_tab_i)
    iota256 = jnp.arange(256, dtype=jnp.int32)[None, :]
    oh = (sym[:, None] == iota256).astype(jnp.bfloat16)  # [N, 256]
    lo = (ehufco & 0xFF).astype(jnp.bfloat16).T  # [256, T]
    hi = ((ehufco >> 8) & 0xFF).astype(jnp.bfloat16).T
    si = ehufsi.astype(jnp.bfloat16).T
    tbl = jnp.concatenate([lo, hi, si], axis=1)  # [256, 3T]
    picked = jnp.dot(oh, tbl, preferred_element_type=jnp.float32)  # [N, 3T]
    code = picked[:, 0].astype(jnp.int32) + picked[:, T].astype(jnp.int32) * 256
    size = picked[:, 2 * T].astype(jnp.int32)
    for t in range(1, T):
        sel = tab == t
        code = jnp.where(
            sel,
            picked[:, t].astype(jnp.int32) + picked[:, T + t].astype(jnp.int32) * 256,
            code,
        )
        size = jnp.where(sel, picked[:, 2 * T + t].astype(jnp.int32), size)

    missing = (item_valid & (size == 0)).any()
    item_val = ((code.astype(jnp.uint32) << ext_l.astype(jnp.uint32))
                | ext_v.astype(jnp.uint32)).astype(jnp.int32)
    item_len = jnp.where(item_valid, size + ext_l, 0)

    hist = None
    if with_hist:
        # Per-table symbol frequencies as one f32 matmul over the already
        # built one-hot: hist[k, t] = sum_i oh[i, k] * [tab_i == t & valid].
        tab_oh = (
            (tab[:, None] == jnp.arange(T, dtype=jnp.int32)[None, :])
            & item_valid[:, None]
        ).astype(jnp.bfloat16)
        hist = jnp.dot(
            oh.T, tab_oh, preferred_element_type=jnp.float32
        ).T.astype(jnp.int32)  # [T, 256]

    # ---- segmented bit pack --------------------------------------------
    # seg_bits from block-level sums (two [B] takes of the item cumsum)
    # instead of an N-sized segment_sum.
    seg_id = jnp.where(item_valid, seg_id, n_segments - 1)
    cum_incl = jnp.cumsum(item_len)
    end_idx = jnp.clip(base + n_sym_v - 1, 0, items_cap - 1)
    blk_bits = jnp.take(cum_incl, end_idx) - (
        jnp.take(cum_incl, base) - jnp.take(item_len, base)
    )
    seg_bits_b = jax.ops.segment_sum(
        blk_bits, seg_of_block, num_segments=n_segments
    )
    words, seg_bits = pack_scan_segments_jax(
        item_val, item_len, seg_id, n_segments, words_per_seg,
        seg_bits=seg_bits_b,
    )
    # Overflow code: bit0 = items_cap, bit1 = words_per_seg, bit2 = nz_cap
    # (callers grow only the bound that actually overflowed).
    overflow = (
        overflow_items.astype(jnp.int32)
        | ((seg_bits > words_per_seg * 32 - 31).any().astype(jnp.int32) << 1)
    )
    if nz_cap < 63:
        overflow = overflow | ((n_nz > nz_cap).any().astype(jnp.int32) << 2)
    if with_hist:
        return words, seg_bits, overflow, missing, hist
    return words, seg_bits, overflow, missing


@partial(
    jax.jit,
    static_argnames=(
        "n_segments", "words_per_seg", "icap", "nz_cap", "wpb_cap",
        "with_hist", "phases", "with_nsym_hist",
    ),
)
def encode_scan_device3(
    zz,  # [B, 64] int32 zig-zag blocks, DC already differential; row order
    #      is arbitrary ("natural") -- `order` gives the bitstream order
    dc_tab,  # [B] int32, NATURAL order (unlike v2's dc_tab in bitstream order)
    ac_tab,  # [B] int32, natural order
    ehufco,  # [T, 256] int32
    ehufsi,  # [T, 256] int32
    seg_of_block,  # [B] int32 nondecreasing, bitstream order
    n_segments: int,
    words_per_seg: int,
    icap: int,  # static per-block item-slot cap (sticky; <= 68 covers all)
    order=None,  # [B] int32: bitstream position -> zz row; None = identity
    nz_cap: int = 16,  # static per-block nonzero-AC cap (sticky)
    wpb_cap: int = 2,  # compact-word capacity per block (sticky)
    with_hist: bool = False,
    phases: tuple = (),  # ((rows_0=B, slots_0), (rows_1, slots_1), ...)
    #   static slot-scan NARROWING schedule: blocks sort by n_sym
    #   DESCENDING on device, phase p runs slots_p AC slots over the
    #   first rows_p sorted blocks (rows strictly decreasing), so the
    #   per-slot [B]-shaped work tracks the true symbol count instead
    #   of B x icap -- the encode mirror of the decode lane narrowing
    #   (lockstep_jax._scan_lanes_phased).  () = flat icap slots.
    with_nsym_hist: bool = False,  # append a [70] histogram of n_sym
    #   (bin 69 = ">=69") so drivers can LEARN a phase schedule from
    #   the first chunk of a stream
):
    """Block-lane generator entropy encode (v3).

    v2 (``encode_scan_device2``) runs ITEM-parallel: every Huffman item
    is a row of an [N]-sized stream, and each N-sized gather (~10 ns/elem)
    / scatter (~13.5 ns/attempt) / cumsum (~3.5) pass taxes all ~12
    items/block.  Measured on v5e that tax is ~118 ns/item -- 70 ms per
    1080p frame, slower than the single-core C reference encoder
    (encoder.c:560-587).

    v3 restructures the work so the expensive ops touch WORDS (~1 per
    block of photographic content) instead of items:

      1. per block, sort AC positions so nonzeros lead (one lax.sort);
      2. a CONSTANT unrolled loop over ``icap`` item slots runs a
         per-block symbol state machine -- every intermediate is a [B]
         vector (the measured-cheap shape), the current nonzero's payload
         comes from a one-hot pick over nz_cap columns, and (code, size)
         from one [B, 256] bf16 one-hot matmul per slot;
      3. bits append into an in-register 64-bit window (two u32 lanes);
         each completed 32-bit word writes into a [B, icap+2] per-block
         buffer via a one-hot column select -- no scatter;
      4. per-block word counts compact into a flat word stream (ONE
         B-attempt mark scatter + cumsum inverse map), and each compact
         word lands in its segment row with two scatter-ADDs -- total
         scatter attempts ~2 words/block instead of ~24 item-halves.

    Zero-pad bits in each block's flush word overlap the next block's
    span but contribute 0 to the adds, so the merge needs no masking.

    Returns (words [n_segments, words_per_seg] u32, seg_bits, overflow,
    missing[, hist]).  Overflow bits: 0 = icap, 1 = words_per_seg,
    2 = nz_cap, 3 = wpb_cap (callers grow the bound that tripped).
    Byte-identical to v2 / the host packer (encoder.c:560-587 semantics).
    """
    if n_segments * words_per_seg * 32 >= 2**31:
        # dst_base/dstbit below are int32 bit offsets into the flat
        # [n_segments * words_per_seg] word array; past 2^31 they wrap
        # negative and the merge scatters into wrong words with no
        # overflow bit.  Both factors are static, so this is trace-time
        # (mirrors the v2 n_segments guard above).
        raise ValueError(
            f"n_segments={n_segments} * words_per_seg={words_per_seg} "
            "* 32 overflows the int32 bit-offset space; encode in "
            "smaller chunks"
        )
    B = zz.shape[0]
    T = ehufco.shape[0]
    i32 = jnp.int32
    u32 = jnp.uint32
    dc = zz[:, 0]
    acs = zz[:, 1:]  # [B, 63]
    nz = acs != 0

    # ---- per-position run/ZRL structure (elementwise, as v2) -----------
    pos = jnp.arange(1, 64, dtype=i32)[None, :]
    last_nz = jax.lax.cummax(jnp.where(nz, pos, 0), axis=1)
    prev_nz = jnp.concatenate(
        [jnp.zeros((B, 1), last_nz.dtype), last_nz[:, :-1]], axis=1
    )
    gap = pos - prev_nz - 1
    n_zrl = jnp.where(nz, gap // 16, 0)  # [B, 63]
    run = jnp.where(nz, gap % 16, 0)
    cat = encode_cat_jax(acs)
    adj = jnp.where(acs < 0, acs - 1, acs)
    extra = (adj & ((i32(1) << cat) - 1)).astype(i32)

    key = jnp.where(nz, pos, i32(64))
    sym_rs = ((run << 4) | cat).astype(i32)
    payload = (n_zrl << 29) | (sym_rs << 21) | (cat << 16) | (extra & 0xFFFF)
    _, s_pay = jax.lax.sort((key, payload), dimension=1, num_keys=1)
    s_pay = s_pay[:, :nz_cap]  # [B, nz_cap] nonzeros in position order

    n_nz = nz.sum(axis=1).astype(i32)
    zrl_total = n_zrl.sum(axis=1).astype(i32)
    has_any = n_nz > 0
    eob = ~(has_any & (last_nz[:, -1] == 63))
    n_sym = 1 + n_nz + zrl_total + eob.astype(i32)  # [B]

    dcat = encode_cat_jax(dc)
    dadj = jnp.where(dc < 0, dc - 1, dc)
    dext = (dadj & ((i32(1) << dcat) - 1)).astype(i32)

    # ---- stacked code tables (lo/hi/size bytes, exact in bf16) ---------
    lo_t = (ehufco & 0xFF).astype(jnp.bfloat16).T  # [256, T]
    hi_t = ((ehufco >> 8) & 0xFF).astype(jnp.bfloat16).T
    si_t = ehufsi.astype(jnp.bfloat16).T
    tbl = jnp.concatenate([lo_t, hi_t, si_t], axis=1)  # [256, 3T]
    iota256 = jnp.arange(256, dtype=i32)[None, :]
    iota_nz = jnp.arange(nz_cap, dtype=i32)[None, :]
    # Words-per-block buffer: each slot emits <=32 bits, so the buffer
    # must track the TOTAL slot budget -- which under a phased schedule
    # is 1 + sum(slots), independent of (and possibly above) icap.
    n_slots = (1 + sum(t for _, t in phases)) if phases else icap
    wb_cap = n_slots + 2
    iota_wb = jnp.arange(wb_cap, dtype=i32)[None, :]

    # ---- generator: lax.scan over item slots (unrolled x8) -------------
    # A Python-unrolled loop compiles superlinearly in icap (~2 min at
    # icap=48 on CPU); lax.scan keeps compile O(1) and unroll=8 restores
    # the fusion across adjacent slots.
    z = jnp.zeros(B, i32)
    zu = jnp.zeros(B, u32)
    hist0 = jnp.zeros((256, T), jnp.float32)
    arangeT = jnp.arange(T, dtype=i32)[None, :]

    def emit(sym, exl, exv, tab, valid, state):
        """Look up (code,size), append to the window, update histogram."""
        acc0, acc1, nbf, wcnt, words_blk, missing, hist = state
        oh = (sym[:, None] == iota256).astype(jnp.bfloat16)  # [B, 256]
        picked = jnp.dot(oh, tbl, preferred_element_type=jnp.float32)
        code = picked[:, 0].astype(i32) + picked[:, T].astype(i32) * 256
        size = picked[:, 2 * T].astype(i32)
        for t in range(1, T):
            sel = tab == t
            code = jnp.where(
                sel,
                picked[:, t].astype(i32) + picked[:, T + t].astype(i32) * 256,
                code,
            )
            size = jnp.where(sel, picked[:, 2 * T + t].astype(i32), size)
        missing = missing | (valid & (size == 0)).any()
        if with_hist:
            tab_oh = ((tab[:, None] == arangeT) & valid[:, None]).astype(
                jnp.bfloat16
            )
            hist = hist + jnp.dot(
                oh.T, tab_oh, preferred_element_type=jnp.float32
            )

        ln = jnp.where(valid, size + exl, 0)
        val = jnp.where(
            valid,
            (code.astype(u32) << exl.astype(u32)) | exv.astype(u32),
            u32(0),
        )
        # append <=32 bits to the in-register MSB-first window
        tot = nbf + ln
        sh_hi = jnp.clip(32 - tot, 0, 31).astype(u32)
        sh_lo = jnp.clip(tot - 32, 0, 31).astype(u32)
        acc0 = acc0 | jnp.where(tot <= 32, val << sh_hi, val >> sh_lo)
        acc1 = acc1 | jnp.where(
            tot > 32, val << jnp.clip(64 - tot, 0, 31).astype(u32), u32(0)
        )
        nbf = tot
        complete = nbf >= 32
        words_blk = jnp.where(
            (iota_wb == wcnt[:, None]) & complete[:, None],
            acc0[:, None],
            words_blk,
        )
        acc0 = jnp.where(complete, acc1, acc0)
        acc1 = jnp.where(complete, u32(0), acc1)
        nbf = jnp.where(complete, nbf - 32, nbf)
        wcnt = wcnt + complete.astype(i32)
        return (acc0, acc1, nbf, wcnt, words_blk, missing, hist)

    def make_ac_step(s_pay_p, n_nz_p, n_sym_p, ac_tab_p):
        def ac_step(carry, j):
            nzi, zc, state = carry
            valid = j < n_sym_p
            nzi_c = jnp.clip(nzi, 0, nz_cap - 1)
            pay = jnp.where(iota_nz == nzi_c[:, None], s_pay_p, 0).sum(
                axis=1, dtype=i32
            )
            nzrl_c = (pay >> 29) & 3
            sym_c = (pay >> 21) & 0xFF
            cat_c = (pay >> 16) & 0x1F
            ext_c = pay & 0xFFFF
            at_nz = nzi < n_nz_p
            is_zrl = at_nz & (zc < nzrl_c)
            is_sym = at_nz & ~is_zrl
            sym = jnp.where(is_zrl, 0xF0, jnp.where(is_sym, sym_c, 0))
            exl = jnp.where(is_sym, cat_c, 0)
            exv = jnp.where(is_sym, ext_c, 0)
            zc = jnp.where(
                valid & is_zrl, zc + 1, jnp.where(valid & is_sym, 0, zc)
            )
            nzi = nzi + (valid & is_sym).astype(i32)
            state = emit(sym, exl, exv, ac_tab_p, valid, state)
            return (nzi, zc, state), None

        return ac_step

    order_eff = order
    ov0 = None
    if phases:
        if phases[0][0] != B:
            raise ValueError("phases[0] rows must equal the block count")
        # Sort blocks by n_sym DESCENDING (ties by row for determinism);
        # every downstream per-block array lives in sorted space, and the
        # bitstream order index absorbs the permutation for free.
        iota_b = jnp.arange(B, dtype=i32)
        neg_sorted, perm = jax.lax.sort(
            ((-n_sym).astype(i32), iota_b), num_keys=1
        )
        nsym_sorted = -neg_sorted
        rank = jnp.zeros(B, i32).at[perm].set(iota_b)
        s_pay_s = jnp.take(s_pay, perm, axis=0)
        n_nz_s = jnp.take(n_nz, perm)
        ac_tab_s = jnp.take(ac_tab, perm)
        order_eff = rank if order is None else jnp.take(rank, order)

        state = (
            zu, zu, z, z,
            jnp.zeros((B, wb_cap), u32),
            jnp.zeros((), jnp.bool_),
            hist0,
        )
        state = emit(
            jnp.take(dcat, perm), jnp.take(dcat, perm),
            jnp.take(dext, perm), jnp.take(dc_tab, perm),
            jnp.ones(B, jnp.bool_), state,
        )
        nzi, zc = z, z
        retired = []  # (acc0, nbf, wcnt, words_blk) of rows done per phase
        ov0 = jnp.asarray(False)
        cap = 1  # slots consumed so far (DC)
        prev_rows = B
        for n_p, t_p in phases:
            if n_p < prev_rows:
                acc0, acc1, nbf, wcnt, words_blk, missing, hist = state
                retired.append(
                    (acc0[n_p:], nbf[n_p:], wcnt[n_p:], words_blk[n_p:])
                )
                ov0 = ov0 | (nsym_sorted[n_p:prev_rows] > cap).any()
                state = (
                    acc0[:n_p], acc1[:n_p], nbf[:n_p], wcnt[:n_p],
                    words_blk[:n_p], missing, hist,
                )
                nzi, zc = nzi[:n_p], zc[:n_p]
                s_pay_s, n_nz_s, ac_tab_s = (
                    s_pay_s[:n_p], n_nz_s[:n_p], ac_tab_s[:n_p]
                )
                prev_rows = n_p
            if t_p > 0:
                step = make_ac_step(
                    s_pay_s, n_nz_s, nsym_sorted[:n_p], ac_tab_s
                )
                (nzi, zc, state), _ = jax.lax.scan(
                    step, (nzi, zc, state),
                    jnp.arange(cap, cap + t_p, dtype=i32),
                    unroll=min(t_p, 8),
                )
            cap += t_p
        acc0, acc1, nbf, wcnt, words_blk, missing, hist = state
        ov0 = ov0 | (nsym_sorted[:prev_rows] > cap).any()
        parts = [(acc0, nbf, wcnt, words_blk)] + list(reversed(retired))
        acc0 = jnp.concatenate([p[0] for p in parts])
        nbf = jnp.concatenate([p[1] for p in parts])
        wcnt = jnp.concatenate([p[2] for p in parts])
        words_blk = jnp.concatenate([p[3] for p in parts])
    else:
        state = (
            zu, zu, z, z,
            jnp.zeros((B, wb_cap), u32),
            jnp.zeros((), jnp.bool_),
            hist0,
        )
        # slot 0: the DC item (always valid; every block has one)
        state = emit(dcat, dcat, dext, dc_tab, jnp.ones(B, jnp.bool_), state)
        if icap > 1:
            (_, _, state), _ = jax.lax.scan(
                make_ac_step(s_pay, n_nz, n_sym, ac_tab),
                (z, z, state),
                jnp.arange(1, icap, dtype=i32),
                unroll=min(icap - 1, 8),
            )
        acc0, acc1, nbf, wcnt, words_blk, missing, hist = state

    has_tail = nbf > 0
    words_blk = jnp.where(
        (iota_wb == wcnt[:, None]) & has_tail[:, None],
        acc0[:, None],
        words_blk,
    )
    n_words = wcnt + has_tail.astype(i32)
    blk_bits = 32 * wcnt + nbf  # [B] natural

    # ---- segment offsets (bitstream order) -----------------------------
    if order_eff is None:
        bits_v, nwords_v, nat_of = blk_bits, n_words, None
    else:
        bits_v = jnp.take(blk_bits, order_eff)
        nwords_v = jnp.take(n_words, order_eff)
        nat_of = order_eff
    seg_bits = jax.ops.segment_sum(
        bits_v, seg_of_block, num_segments=n_segments
    )
    seg_base = jnp.cumsum(seg_bits) - seg_bits
    g_v = jnp.cumsum(bits_v) - bits_v
    off_in_seg = g_v - jnp.take(seg_base, seg_of_block)

    # ---- compact word stream + merge scatter ---------------------------
    w_cap = B * wpb_cap
    wbase = jnp.cumsum(nwords_v) - nwords_v
    w_total = wbase[-1] + nwords_v[-1]
    mark = jnp.zeros(w_cap, i32).at[wbase].add(1, mode="drop")
    iw = jnp.arange(w_cap, dtype=i32)
    b_of_w = jnp.cumsum(mark) - 1  # bitstream block ordinal of each word
    startp = jax.lax.cummax(jnp.where(mark > 0, iw, 0))
    k_in_b = iw - startp
    valid_w = iw < w_total
    b_c = jnp.clip(b_of_w, 0, B - 1)
    # Per-compact-word gathers dominate the merge (~10 ns/elem over
    # w_cap); fold the (row, destination-bit) lookups into ONE
    # precomputed [B] base each so only two takes remain.
    src_base = (
        jnp.arange(B, dtype=i32) * wb_cap
        if nat_of is None
        else nat_of * wb_cap
    )
    wval = jnp.take(
        words_blk.reshape(-1),
        jnp.take(src_base, b_c) + jnp.clip(k_in_b, 0, wb_cap - 1),
        mode="clip",
    )
    wval = jnp.where(valid_w, wval, u32(0))
    dst_base = seg_of_block * (words_per_seg * 32) + off_in_seg  # [B]
    dstbit = jnp.take(dst_base, b_c) + 32 * k_in_b
    r = (dstbit & 31).astype(u32)
    wi = dstbit >> 5
    hi = wval >> r
    lo = jnp.where(r > 0, wval << (u32(32) - jnp.maximum(r, 1)), u32(0))
    oob = n_segments * words_per_seg
    idx = jnp.where(valid_w, wi, oob)
    flat = jnp.zeros(n_segments * words_per_seg, u32)
    flat = flat.at[idx].add(hi, mode="drop")
    flat = flat.at[idx + 1].add(lo, mode="drop")
    words = flat.reshape(n_segments, words_per_seg)

    item_ov = ov0 if phases else (n_sym > icap).any()
    overflow = (
        item_ov.astype(i32)
        | ((seg_bits > words_per_seg * 32).any().astype(i32) << 1)
        | ((w_total > w_cap).astype(i32) << 3)
    )
    if nz_cap < 63:
        overflow = overflow | ((n_nz > nz_cap).any().astype(i32) << 2)
    ret = [words, seg_bits, overflow, missing]
    if with_hist:
        ret.append(hist.T.astype(i32))
    if with_nsym_hist:
        ret.append(jnp.zeros(70, i32).at[jnp.clip(n_sym, 0, 69)].add(1))
    return tuple(ret)


def hist_from_blocks(zz, dc_tab, ac_tab, T: int):
    """Per-table symbol histogram straight from the quantized blocks.

    The dry pass (write_ecs_dry / write_block_dry, encoder.c:525-558)
    WITHOUT running the entropy encoder: every histogram contribution is
    elementwise-derivable from the [B, 63] AC grid --

      * DC:   one category symbol per block (dc already differential);
      * AC:   one (run, cat) symbol per nonzero position;
      * ZRL:  0xF0 times the position's zero-run overflow count;
      * EOB:  symbol 0 once per block not ending at position 63;

    -- so the reduction is one [B, 256] one-hot matmul per AC position
    (a 63-step lax.scan; MXU work ~B*63*256*T MACs, zero scatters) plus
    three tiny block-level matmuls.  Counts accumulate in f32 (exact
    below 2^24; an 8-frame 1080p chunk has ~2.3M items).  Identical to
    the histogram the v3 engine emits slot by slot, at none of the
    packing cost -- the optimize=True pass-1 kernel.
    """
    i32 = jnp.int32
    B = zz.shape[0]
    dc = zz[:, 0]
    acs = zz[:, 1:]
    nz = acs != 0

    pos = jnp.arange(1, 64, dtype=i32)[None, :]
    last_nz = jax.lax.cummax(jnp.where(nz, pos, 0), axis=1)
    prev_nz = jnp.concatenate(
        [jnp.zeros((B, 1), last_nz.dtype), last_nz[:, :-1]], axis=1
    )
    gap = pos - prev_nz - 1
    n_zrl = jnp.where(nz, gap // 16, 0)
    run = jnp.where(nz, gap % 16, 0)
    cat = encode_cat_jax(acs)
    sym_rs = jnp.where(nz, (run << 4) | cat, -1)  # -1: no one-hot match

    arangeT = jnp.arange(T, dtype=i32)[None, :]
    iota256 = jnp.arange(256, dtype=i32)[None, :]
    dc_oh = (dc_tab[:, None] == arangeT).astype(jnp.bfloat16)  # [B, T]
    ac_oh = (ac_tab[:, None] == arangeT).astype(jnp.bfloat16)

    dcat = encode_cat_jax(dc)
    oh_dc = (dcat[:, None] == iota256).astype(jnp.bfloat16)  # [B, 256]
    hist = jnp.dot(
        oh_dc.T, dc_oh, preferred_element_type=jnp.float32
    )  # [256, T]

    def step(h, j):
        s_j = jax.lax.dynamic_index_in_dim(sym_rs, j, axis=1, keepdims=False)
        ohj = (s_j[:, None] == iota256).astype(jnp.bfloat16)
        return h + jnp.dot(
            ohj.T, ac_oh, preferred_element_type=jnp.float32
        ), None

    hist, _ = jax.lax.scan(
        step, hist, jnp.arange(63, dtype=i32), unroll=8
    )

    zrl_blk = n_zrl.sum(axis=1).astype(jnp.float32)  # [B]
    hist = hist.at[0xF0].add(
        jnp.dot(zrl_blk, ac_oh.astype(jnp.float32),
                precision="highest")
    )
    has_any = nz.any(axis=1)
    eob = ~(has_any & (last_nz[:, -1] == 63))
    hist = hist.at[0x00].add(
        jnp.dot(eob.astype(jnp.float32), ac_oh.astype(jnp.float32),
                precision="highest")
    )
    return hist.T.astype(i32)  # [T, 256]


def visit_zz_and_tables(planes, geom, info, tables, ri: int = 0):
    """Shared host prep for the device/native entropy encoders.

    Returns (zz [B,64] int32 visit order with differential DC, dc_tab,
    ac_tab, seg_of [B] int32, ehufco, ehufsi [T,256] int32).
    """
    from ..constants import ZIGZAG
    from .encode import build_visit_order

    comp_idx, block_seq = build_visit_order(geom, info)
    stacked = [np.asarray(planes[cid], np.int64) for cid in info.component_ids]
    zz = np.empty((comp_idx.size, 64), np.int64)
    for j in range(len(info.component_ids)):
        sel = comp_idx == j
        zz[sel] = stacked[j][block_seq[sel]][:, ZIGZAG]

    if info.ns == 1:
        c0 = geom.by_id(info.component_ids[0])
        bpm = c0.h * c0.v
    else:
        bpm = comp_idx.size // geom.n_mcus
    mcu_of = np.arange(comp_idx.size) // bpm
    seg_of = mcu_of // ri if ri else np.zeros_like(mcu_of)

    # Differential DC per component with per-segment predictor reset.
    dc = zz[:, 0].copy()
    for j in range(len(info.component_ids)):
        sel = np.nonzero(comp_idx == j)[0]
        seq = dc[sel]
        prev = np.concatenate(([0], seq[:-1]))
        iv = seg_of[sel]
        first = np.concatenate(([True], iv[1:] != iv[:-1]))
        zz[sel, 0] = np.where(first, seq, seq - prev)

    keys = []
    for td in info.td:
        if (0, td) not in keys:
            keys.append((0, td))
    for ta in info.ta:
        if (1, ta) not in keys:
            keys.append((1, ta))
    tmap = {k: i for i, k in enumerate(keys)}
    ehufco = np.stack([tables[k].ehufco for k in keys]).astype(np.int32)
    ehufsi = np.stack([tables[k].ehufsi for k in keys]).astype(np.int32)
    td = np.asarray([tmap[(0, info.td[j])] for j in range(info.ns)])
    ta = np.asarray([tmap[(1, info.ta[j])] for j in range(info.ns)])
    return (
        zz.astype(np.int32),
        td[comp_idx].astype(np.int32),
        ta[comp_idx].astype(np.int32),
        seg_of.astype(np.int32),
        ehufco,
        ehufsi,
    )


def pack_scan_device(planes, geom, info, tables, ri: int = 0):
    """High-level device entropy encode: planes -> stuffed ECS segments.

    Mirrors entropy.encode.pack_scan (byte-identical output) but runs the
    symbolization + bit packing on the accelerator.  Host work is limited
    to the visit-order constants, the final byte trim/stuff, and marker
    assembly.
    """
    zz, dct, act, seg_of, ehufco, ehufsi = visit_zz_and_tables(
        planes, geom, info, tables, ri
    )
    n_segments = int(seg_of.max()) + 1
    # Worst-case capacity: <= 31 bits per symbol slot, 68 slots per block.
    max_blocks_per_seg = int(np.bincount(seg_of).max())
    words_per_seg = (max_blocks_per_seg * 68 * 31) // 32 + 2

    # zz/tabs come back in visit order, so natural == bitstream here and
    # the v3 engine runs with order=None.
    icap, nz_cap, wpb = 16, 16, 3
    while True:
        words, seg_bits, overflow, missing = encode_scan_device3(
            zz,
            dct,
            act,
            ehufco,
            ehufsi,
            seg_of,
            n_segments,
            int(words_per_seg),
            icap,
            nz_cap=nz_cap,
            wpb_cap=wpb,
        )
        code = int(overflow)
        if not code:
            break
        grew = False
        if code & 0b0001 and icap < 68:
            icap, grew = min(68, icap * 2), True
        if code & 0b0100 and nz_cap < 63:
            nz_cap, grew = min(63, nz_cap * 2), True
        if code & 0b1000 and wpb < 70:
            wpb, grew = min(70, wpb * 2), True
        if not grew:
            raise RuntimeError(
                f"device encode overflow (code={code:#06b}) at maximum "
                "capacities"
            )
    if bool(missing):
        # Same hard failure as the host packer / reference value_to_vlc.
        from ..errors import UnsupportedError

        raise UnsupportedError(
            "a symbol has no code in the selected Huffman table "
            "(content exceeds table range; use optimized tables)"
        )
    words = np.asarray(words)
    seg_bits = np.asarray(seg_bits)
    return [finalize_segment(words[s], int(seg_bits[s])) for s in range(n_segments)]


def finalize_segment(words: np.ndarray, total_bits: int) -> bytes:
    """Host-side: trim, 1-pad the tail byte (flush_bits) and byte-stuff."""
    nbytes = (int(total_bits) + 7) // 8
    by = words.astype(">u4").tobytes()[:nbytes]
    arr = np.frombuffer(by, np.uint8).copy()
    pad = nbytes * 8 - int(total_bits)
    if pad:
        arr[-1] |= (1 << pad) - 1
    is_ff = arr == 0xFF
    if is_ff.any():
        out = np.zeros(arr.size + int(is_ff.sum()), dtype=np.uint8)
        dst = np.arange(arr.size) + np.cumsum(is_ff) - is_ff
        out[dst] = arr
        return out.tobytes()
    return arr.tobytes()
