"""Ablation profile of the lockstep decode scan body on the real TPU.

Variants knock out one piece of the symbol step at a time (results are
WRONG; only cost matters) to locate where the ~60 ms per 8-frame chunk
goes.  Usage: python tools/ablate_scan.py
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax

try:  # persistent compile cache: repeat runs skip the big XLA compiles
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass
import jax.numpy as jnp
import numpy as np

from jpeg_tpu.constants import ZIGZAG
from jpeg_tpu.encoder import EncodeParams, encode_jpeg
from jpeg_tpu.models.device_decode import DeviceDecoder

H, W, UNIQUE, RI, CHUNK, N = 1080, 1920, 8, 4, 8, 8


def make_frame_ppm(seed):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.stack(
        [0.5 + 0.5 * np.sin(xx / 37.0 + seed) * np.cos(yy / 23.0),
         (xx + yy) / (W + H),
         0.5 + 0.5 * np.cos(xx / 61.0 - yy / 41.0)], -1)
    img += rng.normal(0, 0.02, img.shape).astype(np.float32)
    s = np.clip(np.round(img * 255), 0, 255).astype(np.uint8)
    return b"P6\n%d %d\n255\n" % (W, H) + s.tobytes()


def step_body(plan, nbits, words_t, hv_cols, iota_hv, carry, *,
              do_huff=True, do_refill=True, do_decode=True, do_zz=True):
    (bitpos, alive, mcu, slot, coeff, dc_pred, cur_diff,
     w0, w1, pend_key, pend_val) = carry
    T = plan.maxcode.shape[0]
    bpm = plan.blocks_per_mcu

    def sl(table):
        out = jnp.full_like(slot, int(table[0]))
        for s in range(1, bpm):
            out = jnp.where(slot == s, int(table[s]), out)
        return out

    def tabc(col):
        out = jnp.full_like(tab, int(col[0]))
        for t in range(1, T):
            out = jnp.where(tab == t, int(col[t]), out)
        return out

    r = (bitpos & 31).astype(jnp.uint32)
    win = jnp.where(
        r == 0, w0, (w0 << r) | (w1 >> (jnp.uint32(32) - jnp.maximum(r, 1)))
    )
    code16 = (win >> jnp.uint32(16)).astype(jnp.int32)

    is_dc = coeff == 0
    tab = jnp.where(is_dc, sl(plan.slot_dc_tab), sl(plan.slot_ac_tab))
    if do_decode:
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
    else:
        length = (code16 & 7) + 1
        vidx = code16 & 0xFF
        any_ok = alive

    if do_huff:
        oh = (iota_hv == vidx[:, None]).astype(jnp.bfloat16)
        picked = jnp.dot(oh, hv_cols, preferred_element_type=jnp.float32)
        value = picked[:, 0].astype(jnp.int32)
        for t in range(1, T):
            value = jnp.where(tab == t, picked[:, t].astype(jnp.int32), value)
    else:
        value = vidx & 0xFF

    cat = jnp.where(is_dc, jnp.minimum(value, 16), value & 15)
    corrupt = (~any_ok) | (is_dc & (value > 16))
    need = length + cat
    overrun = bitpos + need > nbits
    die = (~alive) | corrupt | overrun

    extra = (
        win >> (jnp.uint32(32) - jnp.minimum(need, 32).astype(jnp.uint32))
    ).astype(jnp.int32) & ((jnp.int32(1) << cat) - 1)
    sign = extra >> jnp.maximum(cat - 1, 0)
    neg = extra - (jnp.int32(1) << cat) + 1
    coef_val = jnp.where(cat == 0, 0, jnp.where(sign != 0, extra, neg))

    block_ok = mcu < plan.n_mcus
    comp = sl(plan.slot_comp)
    dc_null = (~die) & is_dc & (~block_ok) & plan.interleaved

    rs = value
    is_eob = (~is_dc) & (rs == 0)
    zrl = jnp.where(is_dc, 0, rs >> 4)
    new_coeff = jnp.where(is_dc, 1, coeff + zrl)
    ac_corrupt = (~die) & (~is_dc) & (~is_eob) & (new_coeff > 63)
    die = die | dc_null | ac_corrupt
    live = (~die) & alive

    write = live & block_ok & (~is_dc) & (~is_eob)
    nc = jnp.clip(new_coeff, 0, 63)
    if do_zz:
        zz = jnp.zeros_like(nc)
        for j in range(1, 64):
            zz = jnp.where(nc == j, int(ZIGZAG[j]), zz)
    else:
        zz = nc

    em_key = jnp.where(write, ((mcu << 4) | slot) * 64 + zz + 1, 0)
    em_val = coef_val
    em_key = jnp.where(pend_key > 0, pend_key, em_key)
    em_val = jnp.where(pend_key > 0, pend_val, em_val)

    cur_diff = jnp.where(live & is_dc, coef_val, cur_diff)
    after_coeff = jnp.where(is_dc, 1, new_coeff + 1)
    block_done = live & (is_eob | (after_coeff >= 64))

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

    widx_new = bitpos >> 5
    crossed = widx_new != ((bitpos - need) >> 5)
    if do_refill:
        tgt = widx_new + 1
        fetched = jnp.zeros_like(w1)
        for j in range(words_t.shape[0]):
            fetched = jnp.where(tgt == j, words_t[j], fetched)
    else:
        fetched = w1 ^ jnp.uint32(1)
    w0 = jnp.where(crossed, w1, w0)
    w1 = jnp.where(crossed, fetched, w1)

    carry = (bitpos, alive, mcu, slot, coeff, dc_pred, cur_diff,
             w0, w1, pend_key, pend_val)
    return carry, (em_key, em_val)


def main():
    params = EncodeParams(h=2, v=2, quality=75, optimize=False,
                          restart_interval=RI, exact=False)
    unique = [encode_jpeg(make_frame_ppm(s), params) for s in range(UNIQUE)]
    jpegs = [unique[i % UNIQUE] for i in range(CHUNK)]
    dec = DeviceDecoder.for_stream(jpegs[0])
    prepared = dec.prepare(jpegs)
    buf, starts, nbits, qts = prepared[1:]
    idx = starts[:, None] + np.arange(dec.wn, dtype=np.int32)[None, :]
    words = np.asarray(buf)[np.minimum(idx, np.asarray(buf).shape[0] - 1)]
    plan = dec.plan
    from jpeg_tpu.entropy.lockstep_jax import UNROLL, _max_steps_for

    steps = max(dec.max_steps,
                _max_steps_for(nbits.astype(np.int64), plan, RI))
    S = words.shape[0]
    print(f"lanes={S} steps={steps} wn={dec.wn}", flush=True)
    jw, jn = jnp.asarray(words), jnp.asarray(nbits.astype(np.int32))
    mpix = CHUNK * H * W / 1e6

    vpad = ((plan.max_codes + 63) // 64) * 64
    hv_cols = jnp.asarray(plan.huffval[:, :vpad].astype(np.float32)).astype(
        jnp.bfloat16).T
    iota_hv = jnp.arange(vpad, dtype=jnp.int32)[None, :]

    variants = [
        ("full", {}),
        ("no huffval matmul", dict(do_huff=False)),
        ("no canonical loop", dict(do_decode=False)),
        ("no refill loop", dict(do_refill=False)),
        ("no zigzag chain", dict(do_zz=False)),
        ("bare (none of the above)",
         dict(do_huff=False, do_decode=False, do_refill=False, do_zz=False)),
    ]
    for name, kw in variants:
        @functools.partial(jax.jit, static_argnames=("max_steps",))
        def run(words, nbits, max_steps, _kw=tuple(sorted(kw.items()))):
            words_t = words.T
            z = jnp.zeros(S, jnp.int32)
            init = (z, nbits > 0, z, z, z,
                    tuple(z for _ in range(plan.n_comps)), z,
                    words_t[0], words_t[1], z, z)

            def step(carry, _):
                return step_body(plan, nbits, words_t, hv_cols, iota_hv,
                                 carry, **dict(_kw))

            carry, (ek, ev) = jax.lax.scan(step, init, None,
                                           length=max_steps, unroll=UNROLL)
            return carry[2].sum() + ek.sum() + ev.sum()

        r = run(jw, jn, steps)
        r.block_until_ready()
        t0 = time.perf_counter()
        rs = [run(jw, jn, steps) for _ in range(N)]
        rs[-1].block_until_ready()
        dt = (time.perf_counter() - t0) / N
        print(f"{name:28s}: {dt*1e3:6.1f} ms -> {mpix/dt:6.1f} Mpix/s",
              flush=True)


if __name__ == "__main__":
    main()
