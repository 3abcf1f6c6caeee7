"""Ablation profile of the v3 encode entropy slot scan on the real TPU.

Variants knock out one piece of the per-slot emit body at a time
(results WRONG; only cost matters) to locate where the ~8.7 ms/slot
goes at the 16-frame bench shape, and A/B the [B, 256] one-hot code
lookup against a nibble-split two-stage form.  Usage:
python tools/ablate_encode.py
"""

from __future__ import annotations

import sys
import time
from functools import partial

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import os

import jax

if os.environ.get("JPEG_TPU_CPU") == "1":  # sitecustomize overrides
    jax.config.update("jax_platforms", "cpu")  # JAX_PLATFORMS; force here
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass
import jax.numpy as jnp
import numpy as np

N = 6
B = int(sys.argv[1]) if len(sys.argv) > 1 else 48960 * 8  # 8-frame chunk
ICAP = 24
T = 4
NZ_CAP = 16
WB_CAP = ICAP + 2


def timeit(name, fn, *args):
    r = fn(*args)
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        rs = [fn(*args) for _ in range(N)]
        jax.block_until_ready(rs[-1])
        best = min(best, (time.perf_counter() - t0) / N)
    print(f"{name}: {best*1e3:.1f} ms ({best/ICAP*1e3:.2f} ms/slot)",
          flush=True)
    return best


def main():
    rng = np.random.default_rng(0)
    i32, u32 = jnp.int32, jnp.uint32
    s_pay = jnp.asarray(rng.integers(0, 1 << 30, (B, NZ_CAP), dtype=np.int32))
    n_sym = jnp.asarray(rng.integers(4, ICAP, B, dtype=np.int32))
    n_nz = jnp.asarray(rng.integers(0, NZ_CAP, B, dtype=np.int32))
    ac_tab = jnp.asarray(rng.integers(0, T, B, dtype=np.int32))
    tbl = jnp.asarray(
        rng.integers(0, 255, (256, 3 * T), dtype=np.int32)
    ).astype(jnp.bfloat16)
    tblw = jnp.asarray(
        rng.integers(0, 1 << 21, (T, 256), dtype=np.int32)
    )  # packed size<<16|code for gather/nibble variants
    iota256 = jnp.arange(256, dtype=i32)[None, :]
    iota16 = jnp.arange(16, dtype=i32)[None, :]
    iota_nz = jnp.arange(NZ_CAP, dtype=i32)[None, :]
    iota_wb = jnp.arange(WB_CAP, dtype=i32)[None, :]
    z = jnp.zeros(B, i32)
    zu = jnp.zeros(B, u32)

    def body(carry, j, *, do_pick=True, do_lookup=True, do_window=True,
             do_colwrite=True, lookup="onehot"):
        nzi, zc, acc0, acc1, nbf, wcnt, words_blk = carry
        valid = j < n_sym
        if do_pick:
            nzi_c = jnp.clip(nzi, 0, NZ_CAP - 1)
            pay = jnp.where(iota_nz == nzi_c[:, None], s_pay, 0).sum(
                axis=1, dtype=i32
            )
        else:
            pay = j * 37 + nzi
        nzrl_c = (pay >> 29) & 3
        sym = (pay >> 21) & 0xFF
        exl = (pay >> 16) & 0x1F
        exv = pay & 0xFFFF
        at_nz = nzi < n_nz
        is_zrl = at_nz & (zc < nzrl_c)
        zc = jnp.where(valid & is_zrl, zc + 1, jnp.where(valid, 0, zc))
        nzi = nzi + (valid & ~is_zrl).astype(i32)

        if do_lookup:
            if lookup == "onehot":
                oh = (sym[:, None] == iota256).astype(jnp.bfloat16)
                picked = jnp.dot(oh, tbl,
                                 preferred_element_type=jnp.float32)
                code = picked[:, 0].astype(i32) + picked[:, T].astype(
                    i32) * 256
                size = picked[:, 2 * T].astype(i32)
                for t in range(1, T):
                    sel = ac_tab == t
                    code = jnp.where(
                        sel,
                        picked[:, t].astype(i32)
                        + picked[:, T + t].astype(i32) * 256,
                        code,
                    )
                    size = jnp.where(sel, picked[:, 2 * T + t].astype(i32),
                                     size)
            elif lookup == "gather":
                w = jnp.take(tblw.reshape(-1), ac_tab * 256 + sym)
                code, size = w & 0xFFFF, w >> 16
            elif lookup == "nibble":
                # two-stage: lo-nibble one-hot picks 16 columns, then a
                # hi-nibble select chain over the 16 picked values
                lo = sym & 15
                hi = sym >> 4
                oh_lo = (lo[:, None] == iota16).astype(jnp.bfloat16)
                code = z
                size = z
                for t in range(T):
                    # [B, 16] = [B, 16(lo-onehot)] @ [16(lo), 16(hi)]
                    tb = tblw[t].reshape(16, 16).T.astype(jnp.float32)
                    picked = jnp.dot(oh_lo, tb.astype(jnp.bfloat16),
                                     preferred_element_type=jnp.float32)
                    w = z
                    for h in range(16):
                        w = jnp.where(hi == h, picked[:, h].astype(i32), w)
                    sel = ac_tab == t if t else jnp.ones(B, bool)
                    code = jnp.where(sel, w & 0xFFFF, code)
                    size = jnp.where(sel, w >> 16, size)
        else:
            code, size = sym, exl + 3

        if do_window:
            ln = jnp.where(valid, size + exl, 0)
            val = jnp.where(
                valid,
                (code.astype(u32) << exl.astype(u32)) | exv.astype(u32),
                u32(0),
            )
            tot = nbf + ln
            sh_hi = jnp.clip(32 - tot, 0, 31).astype(u32)
            sh_lo = jnp.clip(tot - 32, 0, 31).astype(u32)
            acc0 = acc0 | jnp.where(tot <= 32, val << sh_hi, val >> sh_lo)
            acc1 = acc1 | jnp.where(
                tot > 32,
                val << jnp.clip(64 - tot, 0, 31).astype(u32),
                u32(0),
            )
            nbf = tot
            complete = nbf >= 32
            if do_colwrite:
                words_blk = jnp.where(
                    (iota_wb == wcnt[:, None]) & complete[:, None],
                    acc0[:, None],
                    words_blk,
                )
            acc0 = jnp.where(complete, acc1, acc0)
            acc1 = jnp.where(complete, u32(0), acc1)
            nbf = jnp.where(complete, nbf - 32, nbf)
            wcnt = wcnt + complete.astype(i32)
        return (nzi, zc, acc0, acc1, nbf, wcnt, words_blk), None

    def run(**kw):
        @jax.jit
        def f(s_pay_, n_sym_):
            carry = (z, z, zu, zu, z, z, jnp.zeros((B, WB_CAP), u32))
            carry, _ = jax.lax.scan(
                partial(body, **kw), carry,
                jnp.arange(1, ICAP, dtype=i32), unroll=8
            )
            return carry[5].sum() + carry[6].ravel()[:4].sum()

        return f

    print(f"B={B} icap={ICAP}", flush=True)
    timeit("full body        ", run(), s_pay, n_sym)
    timeit("no payload pick  ", run(do_pick=False), s_pay, n_sym)
    timeit("no code lookup   ", run(do_lookup=False), s_pay, n_sym)
    timeit("no window append ", run(do_window=False), s_pay, n_sym)
    timeit("no column write  ", run(do_colwrite=False), s_pay, n_sym)
    timeit("lookup=gather    ", run(lookup="gather"), s_pay, n_sym)
    timeit("lookup=nibble    ", run(lookup="nibble"), s_pay, n_sym)


if __name__ == "__main__":
    main()
