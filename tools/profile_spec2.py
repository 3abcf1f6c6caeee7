"""Intra-probe stage timing for the speculative v2 engine (8-frame shape).

Times, at the real batched shape: scan only, scan+sort, full
probe+match, and the final decode -- amortized (N dispatches, one
np.asarray sync).  Run ALONE on the box (CPU contention skews host
stages).
"""

from __future__ import annotations

import sys
import time
from functools import partial

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass
import jax.numpy as jnp
import numpy as np

from jpeg_tpu.encoder import EncodeParams, encode_jpeg
from jpeg_tpu.entropy import speculative as spec
from jpeg_tpu.format.parse import parse_codestream, unstuff
from jpeg_tpu.api import _derive_cached
from tools.profile_decode import make_frame_ppm, H, W

N = 8


def timeit(name, fn):
    r = fn()
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:4].sum()
    t0 = time.perf_counter()
    for _ in range(N):
        r = fn()
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:4].sum()
    dt = (time.perf_counter() - t0) / N
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return dt


def main():
    params = EncodeParams(h=2, v=2, quality=75, optimize=False,
                          restart_interval=0, exact=False)
    data = encode_jpeg(make_frame_ppm(3), params)
    cs = parse_codestream(data)
    scan = cs.scans[0]
    tables = {k: _derive_cached(s) for k, s in scan.htables.items()}
    geom = cs.geometry
    plan = spec._cached_plan_of(geom, scan.info, tables)
    seg = unstuff(data[scan.ecs_ranges[0][0]:scan.ecs_ranges[0][1]])
    segs = [seg] * 8

    # replicate the batch-core host prep
    bpm = plan.blocks_per_mcu
    sizes = [seg.size] * 8
    lanes = 1024
    n_max = max(sizes)
    cb = 1 << max(9, (-(-n_max // max(4, lanes)) - 1).bit_length())
    ov = 256 if cb >= 1024 else 128
    win = cb + ov
    wn = (win + 8 + 3) // 4 + 2
    chain = wn <= spec.CHAIN_WN_MAX
    cb_bits, ov_bits = cb * 8, ov * 8
    S_f = [max(1, -(-n // cb)) for n in sizes]
    row_base = np.concatenate(([0], np.cumsum(S_f))).astype(np.int64)
    R = int(row_base[-1])

    t0 = time.perf_counter()
    wmat = np.zeros((R, wn * 4), dtype=np.uint8)
    win_bits = np.zeros(R, np.int64)
    for f in range(8):
        n = sizes[f]
        for i in range(S_f[f]):
            lo = i * cb
            hi = min(lo + win, n)
            r = int(row_base[f]) + i
            wmat[r, : hi - lo] = segs[f][lo:hi]
            win_bits[r] = (hi - lo) * 8
    words = (
        wmat.reshape(R, wn, 4).astype(np.uint32) << np.array([24, 16, 8, 0])
    ).sum(axis=2).astype(np.uint32)
    print(f"host window build: {(time.perf_counter()-t0)*1e3:.0f} ms "
          f"(R={R} wn={wn} chain={chain})", flush=True)

    L = R * bpm
    row_of_lane = np.repeat(np.arange(R, dtype=np.int32), bpm)
    variant = np.tile(np.arange(bpm, dtype=np.int32), R)
    succ = row_of_lane + 1
    succ[np.isin(row_of_lane, row_base[1:] - 1)] = -1
    nbits_l = win_bits[row_of_lane].astype(np.int32)
    steps = (ov_bits // 3 + win * 8 * 2 // 9 + 64 + 63) // 64 * 64
    print(f"L={L} steps={steps}", flush=True)

    jwords = jnp.asarray(words)
    jrow = jnp.asarray(row_of_lane)
    jsucc = jnp.asarray(succ)
    jvar = jnp.asarray(variant)
    jnb = jnp.asarray(nbits_l)
    jsb = jnp.zeros(L, jnp.int32)
    jsl = jnp.asarray(variant)
    vm0 = jnp.zeros(R * ov_bits, jnp.int32)

    # ---- scan only (macro-step chain) ----------------------------------
    @partial(jax.jit, static_argnames=("max_steps",))
    def scan_only(words, nb, sb, sl, max_steps):
        hv_cols, iota_hv = spec._hv_consts(plan)
        words_t = spec._lane_matrix(words, bpm).T
        consts = (("none",), nb, nb, jnp.int32(1 << 29),
                  jnp.int32(cb_bits), jnp.int32(ov_bits), hv_cols, iota_hv)
        carry, (_, _, rk, rv) = spec._chain_scan(
            plan, consts, words_t, sb, sl, nb, max_steps)
        return carry[2].sum() + rk.sum() + rv.sum()

    timeit("scan only", lambda: scan_only(jwords, jnb, jsb, jsl, steps))

    @partial(jax.jit, static_argnames=("max_steps",))
    def scan_sort(words, nb, sb, sl, max_steps):
        hv_cols, iota_hv = spec._hv_consts(plan)
        words_t = spec._lane_matrix(words, bpm).T
        consts = (("none",), nb, nb, jnp.int32(1 << 29),
                  jnp.int32(cb_bits), jnp.int32(ov_bits), hv_cols, iota_hv)
        carry, (_, _, rkey, rval) = spec._chain_scan(
            plan, consts, words_t, sb, sl, nb, max_steps)
        k_t = jnp.where(rval > 0, rkey, spec.BIGKEY).T
        keys_s, recs_s = jax.lax.sort((k_t, rval.T), dimension=1, num_keys=1)
        take = min(spec.TCAP + spec.HCAP, recs_s.shape[1])
        return keys_s[:, :take].sum() + recs_s[:, :take].sum()

    timeit("scan+sort", lambda: scan_sort(jwords, jnb, jsb, jsl, steps))

    # ---- full probe+match ---------------------------------------------
    timeit("probe+match (flat)", lambda: spec._probe_match(
        plan, jwords, jrow, jsucc, jvar, jnb, jsb, jsl, vm0, steps, chain,
        R, ov_bits, cb_bits, reps=bpm)[0])

    # ---- production two-phase probe+match (merge-kill + roster) --------
    for kb in (2, 1):
        timeit(f"probe+match (kill={spec.KILL_STEPS} kb={kb})",
               lambda kb=kb: spec._probe_match(
                   plan, jwords, jrow, jsucc, jvar, jnb, jsb, jsl, vm0,
                   steps, chain, R, ov_bits, cb_bits, reps=bpm,
                   kill_steps=spec.KILL_STEPS, kb=kb)[0])

    # ---- final decode at the production shape --------------------------
    # Junk-but-shape-true inputs: every chunk starts at bit 0 / slot 0 of
    # its window and owns a full-chunk span; per-step cost is content-
    # independent (lanes that die keep paying selects), so the timing is
    # representative of the real final pass.
    total_blocks = sum(geom.by_id(cid).n_blocks
                       for cid in scan.info.component_ids)
    F = 8
    frame_row_base = (np.repeat(np.arange(F, dtype=np.int64) * total_blocks,
                                np.diff(row_base).astype(np.int64))
                      ).astype(np.int32)
    frame_first = np.repeat(row_base[:-1],
                            np.diff(row_base).astype(np.int64)
                            ).astype(np.int32)
    blocks_per_row = bpm * (cb_bits // 24)  # generous per-chunk block cap
    g0 = (np.arange(R, dtype=np.int64)
          - np.repeat(row_base[:-1], np.diff(row_base).astype(np.int64))
          ) * blocks_per_row
    nblk = np.full(R, blocks_per_row, np.int32)
    fsteps = int(win * 8 * 2 // 9 + 96 + 63) // 64 * 64
    nrows = F * total_blocks
    j_frb = jnp.asarray(frame_row_base)
    j_wb = jnp.asarray(win_bits.astype(np.int32))
    j_ff = jnp.asarray(frame_first)
    z = jnp.zeros(R, jnp.int32)
    timeit(f"final[{R}rows x {fsteps}steps -> {nrows} blk]",
           lambda: spec._final_decode(
               plan, jwords, j_frb, j_wb, z, z,
               jnp.asarray(np.minimum(g0, total_blocks - 1).astype(np.int32)),
               jnp.asarray(nblk), j_ff, fsteps, nrows, chain)[0])


if __name__ == "__main__":
    main()
