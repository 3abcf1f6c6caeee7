"""Phased decode roofline: production-path stage timing + attempts ratio.

Measures the PRODUCTION phased decode (`_decode_device_phased`) per
8-frame chunk, decomposes scan/place/dense, computes the placement
scatter's attempts-to-true-symbols ratio for the current learned
schedule, and A/Bs finer cut schedules (VERDICT r2 item 1: done =
device-resident >= 450 Mpix/s or attempts <= 1.2x true symbols at the
6.8 ns/attempt scatter floor).  Usage: python tools/profile_decode3.py
"""

from __future__ import annotations

import functools
import sys
import time

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

from jpeg_tpu.models import device_decode as dd
from jpeg_tpu.models.device_decode import DeviceDecoder, _decode_device_phased
from jpeg_tpu.entropy.lockstep_jax import (
    _place_emissions,
    _scan_lanes,
    _scan_lanes_phased,
)
from tools.profile_decode import make_frame_ppm, H, W, UNIQUE, RI
from jpeg_tpu.encoder import EncodeParams, encode_jpeg

CHUNK = 8
N = 8


def timeit(fn, *args):
    r = fn(*args)
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        rs = [fn(*args) for _ in range(N)]
        jax.block_until_ready(rs[-1])
        best = min(best, (time.perf_counter() - t0) / N)
    return best


def phases_from(lane_steps, sort_order, frames, max_steps, divs):
    """Replicates DeviceDecoder._phases_for with a configurable cut list."""
    spf = lane_steps.shape[0]
    S = frames * spf
    pred = np.repeat(lane_steps[sort_order], frames)
    cuts = [S]
    for d in divs:
        n = max(128, S // d // 128 * 128)
        if n < cuts[-1]:
            cuts.append(n)
    bounds = []
    for i in range(len(cuts)):
        if i + 1 < len(cuts):
            b = int(pred[min(cuts[i + 1], S - 1)])
        else:
            b = max(max_steps, int(pred[0]) + 32)
        bounds.append(max(64, (b + 31) // 32 * 32))
    bounds = list(np.maximum.accumulate(bounds))
    phases = []
    acc = 0
    for n, b in zip(cuts, bounds):
        if b - acc <= 0:
            continue
        phases.append((int(n), int(b - acc)))
        acc = b
    return tuple(phases)


def main():
    params = EncodeParams(h=2, v=2, quality=75, optimize=False,
                          restart_interval=RI, exact=False)
    unique = [encode_jpeg(make_frame_ppm(s), params) for s in range(UNIQUE)]
    jpegs = [unique[i % UNIQUE] for i in range(64)]
    dec = DeviceDecoder.for_stream(jpegs[0])
    out = dec.decode_batch(jpegs[:16], chunk=CHUNK)  # warm + learn
    out.block_until_ready()
    assert dec.lane_steps is not None, "learning pass did not run"

    prepared = dec.prepare(jpegs[:CHUNK])
    kind, data, perm, nbits, qts = prepared
    print(f"prep kind={kind}")
    assert kind == "mats"
    frames, spf = CHUNK, dec.segs_per_frame
    S = frames * spf
    nb64 = nbits.astype(np.int64)
    max_steps = max(dec.max_steps, dd._max_steps_for(nb64, dec.plan, dec.ri))
    mpix = CHUNK * H * W / 1e6

    # True per-lane consumed steps (ground truth for the attempts ratio):
    # run the learning scan on the same chunk.
    idx_unsorted = np.argsort(perm, kind="stable")  # original -> sorted? perm: sorted->orig
    jw = jnp.asarray(data)
    jn = jnp.asarray(nbits)
    jq = jnp.asarray(qts)
    jperm = jnp.asarray(perm)
    _, _, _, nsteps = dd._decode_device_learn(
        dec.plan, dec.geom, jw, jn, jq, max_steps, frames, spf)
    true_steps = int(np.asarray(nsteps).sum())
    print(f"S={S} max_steps={max_steps} true_steps={true_steps} "
          f"(mean {true_steps/S:.0f}/lane)")

    base_phases = dec._phases_for(frames, max_steps)

    def report(tag, phases):
        attempts = sum(n * t for n, t in phases)
        full = functools.partial(
            _decode_device_phased, dec.plan, dec.geom)
        dt = timeit(lambda: full(jw, jn, jq, jperm, phases, frames, spf)[0])
        print(f"{tag}: phases={len(phases)} attempts={attempts} "
              f"ratio={attempts/true_steps:.2f} "
              f"full {dt*1e3:.1f} ms -> {mpix/dt:.1f} Mpix/s")
        return dt

    report("prod  (2,4,16)", base_phases)
    for tag, divs in (
        ("fine  (2,3,4,6,8,12,16,24,32)", (2, 3, 4, 6, 8, 12, 16, 24, 32)),
        ("med   (2,4,8,16,32)", (2, 4, 8, 16, 32)),
        ("xfine (48 cuts)", tuple(np.unique(np.geomspace(1.15, 128, 48).astype(int)))),
    ):
        report(tag, phases_from(dec.lane_steps, dec.sort_order, frames,
                                max_steps, divs))

    # Stage decomposition on the production schedule
    total_blocks = sum(c.n_blocks for c in dec.geom.components)

    @jax.jit
    def scan_only(words, nbits):
        counts, streams, starved, _ = _scan_lanes_phased(
            dec.plan, words, nbits, base_phases)
        s = counts.sum()
        for ek, ev in streams:
            s = s + ek.sum() + ev.sum()
        return s

    @jax.jit
    def scan_place(words, nbits, perm):
        counts, streams, starved, _ = _scan_lanes_phased(
            dec.plan, words, nbits, base_phases)
        coeffs = _place_emissions(
            dec.plan, counts, streams, frames, spf, total_blocks,
            perm=perm, combine="set")
        return coeffs.ravel()[:8].sum()

    coeffs0 = jnp.zeros((frames, total_blocks, 64), jnp.int32)

    @jax.jit
    def dense_only(coeffs, qts):
        return dd._dense_from_coeffs(coeffs, dec.geom, qts)

    t_scan = timeit(scan_only, jw, jn)
    t_sp = timeit(scan_place, jw, jn, jperm)
    t_dense = timeit(dense_only, coeffs0, jq)
    print(f"stage scan(phased) {t_scan*1e3:.1f} ms | +place "
          f"{t_sp*1e3:.1f} ms (place ~{(t_sp-t_scan)*1e3:.1f}) | dense "
          f"{t_dense*1e3:.1f} ms")
    att = sum(n * t for n, t in base_phases)
    print(f"place floor @6.8ns/attempt: {att*6.8e-6:.1f} ms "
          f"(true-symbol floor {true_steps*6.8e-6:.1f} ms)")

    # ---- Pallas lane-region placement A/B (entropy/place_pallas) ------
    from jpeg_tpu.entropy.place_pallas import (
        place_emissions_region,
        placement_eligible,
    )

    if not placement_eligible(dec.plan, dec.ri, spf):
        print("region placement: not eligible on this shape")
        return
    interp = jax.default_backend() != "tpu"
    # Classic (frame-major) chunk for the region path: no sorting needed.
    sort_keep, dec.sort_order = dec.sort_order, None
    kindc, datac, _, nbitsc, _ = dec.prepare(jpegs[:CHUNK])
    dec.sort_order = sort_keep
    print(f"region prep kind={kindc}")
    jwc = jnp.asarray(datac)
    jnc = jnp.asarray(nbitsc)
    full_r = functools.partial(
        dd._decode_device, dec.plan, dec.geom,
    )
    dt = timeit(lambda: full_r(jwc, jnc, jq, max_steps, frames, spf,
                               place_ri=dec.ri, interpret=interp)[0])
    print(f"region: full {dt*1e3:.1f} ms -> {mpix/dt:.1f} Mpix/s "
          f"(per-tile exact bounds; attempts ~ sum(tile max))")

    @jax.jit
    def scan_place_region(words, nbits):
        counts, (ek, ev), starved, nsteps = _scan_lanes(
            dec.plan, words, nbits, max_steps)
        coeffs = place_emissions_region(
            dec.plan, ek, ev, nsteps, frames, spf, dec.ri,
            interpret=interp)
        return coeffs.ravel()[:8].sum()

    @jax.jit
    def scan_classic(words, nbits):
        counts, (ek, ev), starved, nsteps = _scan_lanes(
            dec.plan, words, nbits, max_steps)
        return counts.sum() + ek.sum() + ev.sum() + nsteps.sum()

    t_sc = timeit(scan_classic, jwc, jnc)
    t_spr = timeit(scan_place_region, jwc, jnc)
    # Per-tile attempt count (what the kernel actually loops)
    _, _, _, nst = dd._decode_device_learn(
        dec.plan, dec.geom, jwc, jnc, jq, max_steps, frames, spf)
    nst = np.asarray(nst)
    pad = (-nst.size) % 128
    tile_att = int(
        np.pad(nst, (0, pad)).reshape(-1, 128).max(axis=1).sum() * 128
    )
    print(f"stage scan(classic) {t_sc*1e3:.1f} ms | +place(region) "
          f"{t_spr*1e3:.1f} ms (region ~{(t_spr-t_sc)*1e3:.1f}) | "
          f"tile attempts={tile_att} ratio={tile_att/true_steps:.2f}")


if __name__ == "__main__":
    main()
