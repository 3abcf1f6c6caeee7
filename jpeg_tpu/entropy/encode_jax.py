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
from typing import Tuple

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
):
    """Segmented bit packing: one cumsum + two scatter-ADDs total.

    Each restart segment's bitstream starts at its own offset 0
    (byte-aligned flush happens host-side in finalize_segment).  Returns
    (words [n_segments, words_per_seg] uint32, seg_bits [n_segments]).
    """
    glob = jnp.cumsum(item_len) - item_len
    seg_bits = jax.ops.segment_sum(item_len, seg_id, num_segments=n_segments)
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


def pack_scan_device(planes, geom, info, tables, ri: int = 0):
    """High-level device entropy encode: planes -> stuffed ECS segments.

    Mirrors entropy.encode.pack_scan (byte-identical output) but runs the
    symbolization + bit packing on the accelerator.  Host work is limited
    to the visit-order constants, the final byte trim/stuff, and marker
    assembly.
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

    n_segments = int(seg_of.max()) + 1
    # Capacity: <= 31 bits per symbol slot, 68 slots per block.
    max_blocks_per_seg = int(np.bincount(seg_of).max())
    words_per_seg = (max_blocks_per_seg * 68 * 31) // 32 + 2

    words, seg_bits, _hist = encode_scan_device(
        zz.astype(np.int32),
        td[comp_idx].astype(np.int32),
        ta[comp_idx].astype(np.int32),
        ehufco,
        ehufsi,
        seg_of.astype(np.int32),
        n_segments,
        int(words_per_seg),
    )
    words = np.asarray(words)
    seg_bits = np.asarray(seg_bits)
    hist = np.asarray(_hist)
    missing = (hist > 0) & (ehufsi == 0)
    if missing.any():
        # Same hard failure as the host packer / reference value_to_vlc.
        from ..errors import UnsupportedError

        bad = int(np.nonzero(missing.any(axis=0))[0][0])
        raise UnsupportedError(
            f"symbol 0x{bad:02x} has no code in the selected Huffman table "
            "(content exceeds table range; use optimized tables)"
        )
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
