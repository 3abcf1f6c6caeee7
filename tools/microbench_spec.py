"""Primitive costs for the speculative-v2 design, measured on the TPU.

Amortized (N async dispatches, one sync) per CLAUDE.md timing rules.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass
import jax.numpy as jnp
import numpy as np
from functools import partial

N = 16


def timeit(name, fn, *args):
    r = fn(*args)
    np.asarray(r).sum()  # force full sync (remote block_until_ready lies)
    t0 = time.perf_counter()
    rs = [fn(*args) for _ in range(N)]
    np.asarray(rs[-1]).sum()
    dt = (time.perf_counter() - t0) / N
    print(f"{name}: {dt*1e3:.2f} ms", file=sys.stderr)
    return dt


def main():
    rng = np.random.default_rng(0)

    # 1) lax.sort [L, steps] two-operand (meta extraction), per frame and 8f
    for L, steps in ((2334, 960), (18700, 960), (624, 5568)):
        k = jnp.asarray(rng.integers(0, 1 << 30, (L, steps), dtype=np.int32))
        v = jnp.asarray(rng.integers(0, 1 << 30, (L, steps), dtype=np.int32))

        @jax.jit
        def srt(k, v):
            a, b = jax.lax.sort((k, v), dimension=1, num_keys=1)
            return b[:, :256].sum()

        timeit(f"sort[{L},{steps}]", srt, k, v)

    # 2) scan step cost vs lane count and refill mode
    for L, wn, steps in ((2334, 160, 960), (18700, 160, 960), (4992, 1038, 960)):
        words = jnp.asarray(
            rng.integers(0, 1 << 32, (L, wn), dtype=np.uint32).astype(np.uint32)
        )
        nbits = jnp.full((L,), wn * 32, jnp.int32)

        @partial(jax.jit, static_argnames=("steps", "mode"))
        def scan(words, nbits, steps, mode):
            wt = words.T

            def step(carry, _):
                bitpos, w0, w1, acc = carry
                r = (bitpos & 31).astype(jnp.uint32)
                win = jnp.where(
                    r == 0, w0,
                    (w0 << r) | (w1 >> (jnp.uint32(32) - jnp.maximum(r, 1))),
                )
                need = 3 + (win >> 29).astype(jnp.int32)
                bitpos = bitpos + need
                widx = bitpos >> 5
                crossed = widx != ((bitpos - need) >> 5)
                if mode == "chain":
                    tgt = widx + 1
                    fetched = jnp.zeros_like(w1)
                    for j in range(wt.shape[0]):
                        fetched = jnp.where(tgt == j, wt[j], fetched)
                else:
                    idx = (
                        jnp.arange(words.shape[0], dtype=jnp.int32) * wn
                        + jnp.clip(widx + 1, 0, wn - 1)
                    )
                    fetched = jnp.take(words.reshape(-1), idx, mode="clip")
                w0 = jnp.where(crossed, w1, w0)
                w1 = jnp.where(crossed, fetched, w1)
                acc = acc + win.astype(jnp.int32)
                return (bitpos, w0, w1, acc), None

            init = (jnp.zeros(words.shape[0], jnp.int32), wt[0], wt[1],
                    jnp.zeros(words.shape[0], jnp.int32))
            carry, _ = jax.lax.scan(step, init, None, length=steps, unroll=8)
            return carry[3].sum()

        for mode in ("chain", "gather") if wn <= 200 else ("gather",):
            timeit(f"scan[{L},wn={wn}]x{steps} {mode}", scan, words, nbits,
                   steps, mode)

    # 3) link-match scatter + gather at [L, CAP] scale
    L, HCAP, TCAP, S, OVB = 18700, 160, 64, 3120, 1024
    src = jnp.asarray(rng.integers(0, 1 << 20, (L, HCAP), dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, S * OVB, (L, HCAP), dtype=np.int32))

    @jax.jit
    def scat(src, idx):
        vm = jnp.zeros(S * OVB, jnp.int32)
        return vm.at[idx.reshape(-1)].max(src.reshape(-1), mode="drop").sum()

    timeit(f"scatter-max[{L}x{HCAP}]->[{S*OVB}]", scat, src, idx)

    gidx = jnp.asarray(rng.integers(0, S * OVB, (L, TCAP), dtype=np.int32))
    vm = jnp.asarray(rng.integers(0, 1 << 20, S * OVB, dtype=np.int32))

    @jax.jit
    def gath(vm, gidx):
        return jnp.take(vm, gidx, mode="clip").sum()

    timeit(f"gather[{L}x{TCAP}]", gath, vm, gidx)


if __name__ == "__main__":
    main()
