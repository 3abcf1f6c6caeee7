"""Pallas TPU kernel for the lockstep entropy decoder.

Same per-symbol math as ``lockstep_jax._symbol_step`` (literally the same
function), but the whole symbol loop runs INSIDE one Pallas kernel: lane
state lives in vector registers / VMEM across all steps, the segment
words tile sits in VMEM, and emissions stream to VMEM output blocks --
no per-iteration HBM round trips, no XLA loop overhead.

Grid: one program per LANES-wide tile of segments; each program runs the
full fori_loop over max_steps for its tile.  Plan tables ride along as
(replicated) VMEM inputs because Pallas kernels may not capture array
constants.  The emission layout and placement pass are shared with the
scan engine, so this is a drop-in producer for decode_scan_device.

STATUS: semantics are pinned against the scan engine (exact-equal
outputs, tests/test_lockstep_pallas.py, interpret mode).  On this dev
environment's remote-compile Pallas toolchain the kernel does not
build: round 1 saw the Mosaic compile hang (>400 s); on round 2's
jax 0.9 the trace of the unrolled step loop additionally blows Python
recursion at default limits, and with sys.setrecursionlimit(200000)
the trace/compile still exceeds 9 minutes.  More importantly, round-2
ablation profiling (tools/ablate_scan.py) showed the scan this kernel
would replace costs ~5 ms per 8x1080p chunk -- the decode bottlenecks
are the placement scatter (~26 ms) and, on this box, the upload tunnel
(docs/ARCHITECTURE.md roofline).  A Pallas win would have to target
the scatter, not the scan; the scan engine remains the production path.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import ZIGZAG
from .lockstep import ScanPlan
from .lockstep_jax import (
    _iota_row,
    _place_emissions,
    _symbol_step,
)

LANES = 512  # lanes per grid program (VMEM budget: 4 emission blocks)


def default_interpret() -> bool:
    """Pallas only compiles on TPU; interpret elsewhere (tests on CPU)."""
    return jax.default_backend() != "tpu"


def _plan_tensors(plan: ScanPlan):
    """Plan tables as three stacked int32 tensors (kernel inputs)."""
    slot_tabs = np.stack(
        [
            plan.slot_comp,
            plan.slot_v,
            plan.slot_h,
            plan.slot_V,
            plan.slot_H,
            plan.slot_bx,
            plan.slot_nblocks,
            plan.slot_plane_offset,
            plan.slot_dc_tab,
            plan.slot_ac_tab,
        ]
    ).astype(np.int32)
    codes = np.stack([plan.mincode, plan.maxcode, plan.valptr]).astype(np.int32)
    hv_w = ((plan.max_codes + 63) // 64) * 64
    hv = plan.huffval[:, :hv_w].astype(np.int32)
    zz = ZIGZAG.astype(np.int32)[None, :]
    return slot_tabs, codes.reshape(-1, 17), hv, zz


def _make_kernel(plan: ScanPlan, max_steps: int, wn: int, t_tables: int):
    def kernel(
        words_ref, nbits_ref, slot_ref, codes_ref, hv_ref, zz_ref,
        emk_ref, emv_ref, adk_ref, adv_ref, counts_ref, alive_ref,
    ):
        words = words_ref[:].astype(jnp.uint32)  # [LANES, Wn]
        nbits = nbits_ref[:][:, 0]  # [LANES]
        codes = codes_ref[:].reshape(3, t_tables, 17)
        k = dict(
            slot_comp=slot_ref[0],
            slot_v=slot_ref[1],
            slot_h=slot_ref[2],
            slot_V=slot_ref[3],
            slot_H=slot_ref[4],
            slot_bx=slot_ref[5],
            slot_nblocks=slot_ref[6],
            slot_plane_offset=slot_ref[7],
            slot_dc_tab=slot_ref[8],
            slot_ac_tab=slot_ref[9],
            mincode=codes[0],
            maxcode=codes[1],
            valptr=codes[2],
            huffval=hv_ref[:],
            zigzag=zz_ref[:][0],
        )
        iota_w = _iota_row(wn)
        iota_hv = _iota_row(int(k["huffval"].shape[1]))

        z = jnp.zeros(LANES, jnp.int32)
        init = (
            z,
            nbits > 0,
            z,
            z,
            z,
            jnp.zeros((LANES, plan.n_comps), jnp.int32),
            z,
        )

        def body(n, carry):
            carry, (em_key, em_val, ad_key, ad_val) = _symbol_step(
                plan, k, words, nbits, iota_w, iota_hv, carry
            )
            emk_ref[pl.ds(n, 1), :] = em_key[None, :]
            emv_ref[pl.ds(n, 1), :] = em_val[None, :]
            adk_ref[pl.ds(n, 1), :] = ad_key[None, :]
            adv_ref[pl.ds(n, 1), :] = ad_val[None, :]
            return carry

        final = jax.lax.fori_loop(0, max_steps, body, init)
        counts_ref[:] = final[2][:, None]
        alive_ref[:] = final[1].astype(jnp.int32)[:, None]

    return kernel


@partial(jax.jit, static_argnames=("plan", "max_steps", "interpret"))
def _decode_segments_pallas(
    plan: ScanPlan,
    words: jnp.ndarray,  # [S, Wn] uint32; S must be a LANES multiple
    nbits: jnp.ndarray,  # [S] int32
    max_steps: int,
    interpret: bool = False,
):
    s, wn = words.shape
    assert s % LANES == 0
    grid = (s // LANES,)
    slot_tabs, codes, hv, zz = _plan_tensors(plan)
    t_tables = hv.shape[0]

    rep = lambda shape: pl.BlockSpec(  # noqa: E731  (replicated input)
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    emission = jax.ShapeDtypeStruct((max_steps, s), jnp.int32)
    lanecol = jax.ShapeDtypeStruct((s, 1), jnp.int32)

    out = pl.pallas_call(
        _make_kernel(plan, max_steps, wn, t_tables),
        grid=grid,
        in_specs=[
            pl.BlockSpec((LANES, wn), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            rep(slot_tabs.shape),
            rep(codes.shape),
            rep(hv.shape),
            rep(zz.shape),
        ],
        out_specs=[
            pl.BlockSpec((max_steps, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((max_steps, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((max_steps, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((max_steps, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[emission, emission, emission, emission, lanecol, lanecol],
        interpret=interpret,
    )(
        words,
        nbits[:, None],
        jnp.asarray(slot_tabs),
        jnp.asarray(codes),
        jnp.asarray(hv),
        jnp.asarray(zz),
    )
    em_key, em_val, ad_key, ad_val, counts, alive = out
    return counts[:, 0], em_key, em_val, ad_key, ad_val, alive[:, 0]


@partial(
    jax.jit,
    static_argnames=(
        "plan", "max_steps", "total_blocks", "frames", "segs_per_frame", "interpret",
    ),
)
def decode_scan_device_pallas(
    plan: ScanPlan,
    words: jnp.ndarray,
    nbits: jnp.ndarray,
    max_steps: int,
    total_blocks: int,
    frames: int = 1,
    segs_per_frame: int = 0,
    interpret: bool = False,
):
    """Pallas-engine variant of decode_scan_device (same outputs).

    Lanes are padded to a LANES multiple (padding lanes have nbits=0 and
    decode nothing); padding is appended AFTER all real lanes so the
    per-frame reshape of real lanes is unaffected.
    """
    s = words.shape[0]
    spf = segs_per_frame or s
    pad = (-s) % LANES
    if pad:
        words = jnp.pad(words, ((0, pad), (0, 0)))
        nbits_p = jnp.pad(nbits, (0, pad))
    else:
        nbits_p = nbits
    counts_p, em_key, em_val, ad_key, ad_val, alive = _decode_segments_pallas(
        plan, words, nbits_p, max_steps, interpret=interpret
    )
    counts = counts_p[:s]
    starved = alive[:s].any()
    coeffs = _place_emissions(
        plan, counts,
        [(em_key[:, :s], em_val[:, :s]), (ad_key[:, :s], ad_val[:, :s])],
        frames, spf, total_blocks,
    )
    return counts, coeffs, starved
