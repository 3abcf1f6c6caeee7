"""Host-only evaluation of phased-scan cut schedules (no TPU needed).

Computes the bench stream's TRUE per-segment symbol counts via the
NumPy symbolize pass, then evaluates placement-scatter ATTEMPTS =
sum(n_p * t_p) for candidate cut lists against the true total -- the
ratio VERDICT r2 item 1 asks to drive to <= 1.2.  Device timing still
decides (each extra phase has fixed dispatch cost), but the ratio math
is pure arithmetic over the learned distribution.

Usage: python tools/eval_phase_schedule.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import os

import jax

if os.environ.get("JPEG_TPU_CPU") == "1":  # sitecustomize overrides
    jax.config.update("jax_platforms", "cpu")  # JAX_PLATFORMS; force here
import numpy as np

from jpeg_tpu.encoder import (
    EncodeParams,
    _jitted_encode_frame,
    geometry_for_image,
    scale_qtable,
)
from jpeg_tpu.constants import STD_CHROMINANCE_QUANT, STD_LUMINANCE_QUANT
from jpeg_tpu.entropy.encode import symbolize_scan
from jpeg_tpu.geometry import ScanInfo
from jpeg_tpu.utils.pnm import read_pnm
from tools.profile_decode import make_frame_ppm, H, W, UNIQUE, RI

CHUNK = 8


def frame_planes(pnm_bytes, params):
    probe = read_pnm(pnm_bytes)
    geom = geometry_for_image(probe, params)
    img = read_pnm(pnm_bytes, pad_to=(8 * geom.max_v, 8 * geom.max_h))
    qtables = np.ones((4, 64), dtype=np.uint16)
    qtables[0] = scale_qtable(STD_LUMINANCE_QUANT, params.quality)
    qtables[1] = scale_qtable(STD_CHROMINANCE_QUANT, params.quality)
    dense = _jitted_encode_frame(geom, params.exact)
    planes = dense(img.data, qtables.astype(np.int32))
    planes = {cid: np.asarray(p) for cid, p in planes.items()}
    info = ScanInfo(
        component_ids=tuple(
            c.cid for c in sorted(geom.components, key=lambda c: c.cid)
        ),
        td=tuple(c.td for c in sorted(geom.components, key=lambda c: c.cid)),
        ta=tuple(c.ta for c in sorted(geom.components, key=lambda c: c.cid)),
    )
    return planes, geom, info

def phases_from(pred_sorted, S, max_steps, divs, quantum=32):
    cuts = [S]
    for d in divs:
        n = max(128, S // d // 128 * 128)
        if n < cuts[-1]:
            cuts.append(n)
    bounds = []
    for i in range(len(cuts)):
        if i + 1 < len(cuts):
            b = int(pred_sorted[min(cuts[i + 1], S - 1)])
        else:
            b = max(max_steps, int(pred_sorted[0]) + 32)
        bounds.append(max(64, (b + quantum - 1) // quantum * quantum))
    bounds = list(np.maximum.accumulate(bounds))
    phases = []
    acc = 0
    for n, b in zip(cuts, bounds):
        if b - acc <= 0:
            continue
        phases.append((int(n), int(b - acc)))
        acc = b
    return phases


def main():
    # Per-segment symbol counts across the bench stream's unique frames
    params = EncodeParams(h=2, v=2, quality=75, optimize=False,
                          restart_interval=RI, exact=False)
    per_seg = []
    for s in range(UNIQUE):
        planes, geom, info = frame_planes(make_frame_ppm(s), params)
        syms = symbolize_scan(planes, geom, info, RI)
        seg = syms.mcu_index // RI
        per_seg.append(np.bincount(seg, minlength=int(seg.max()) + 1))
    per_seg = np.stack(per_seg)  # [UNIQUE, spf]
    spf = per_seg.shape[1]
    print(f"spf={spf} symbols/seg mean={per_seg.mean():.0f} "
          f"p50={np.percentile(per_seg, 50):.0f} "
          f"p95={np.percentile(per_seg, 95):.0f} max={per_seg.max()}")

    # the learner's prediction: per-seg max over frames * 1.15 + 16
    pred = (per_seg.max(axis=0) * 1.15).astype(np.int64) + 16
    # chunk lanes = spf segments x CHUNK frames, rank-major sorted desc
    pred_lanes = np.repeat(np.sort(pred)[::-1], CHUNK)
    S = spf * CHUNK
    true_total = int(per_seg[:CHUNK].sum())
    max_steps = int(pred.max()) + 32

    print(f"S={S} true_steps={true_total} "
          f"(ideal attempts ratio from prediction slack alone: "
          f"{np.repeat(pred, CHUNK).sum()/true_total:.3f})")
    for tag, divs, q in (
        ("prod  (2,4,16) q32", (2, 4, 16), 32),
        ("med   (2,4,8,16,32) q32", (2, 4, 8, 16, 32), 32),
        ("fine  (2,3,4,6,8,12,16,24,32,48) q16",
         (2, 3, 4, 6, 8, 12, 16, 24, 32, 48), 16),
        ("xfine (24 geometric) q16",
         tuple(np.unique(np.geomspace(1.2, 120, 24).astype(int))), 16),
        ("huge  (48 geometric) q8",
         tuple(np.unique(np.geomspace(1.1, 127, 48).astype(int))), 8),
    ):
        ph = phases_from(pred_lanes, S, max_steps, divs, q)
        att = sum(n * t for n, t in ph)
        print(f"{tag}: phases={len(ph)} attempts={att} "
              f"ratio={att/true_total:.3f}")

    # ---- tighter prediction slack + starved-lane repair dispatch -------
    # If rare starved lanes repair via a small [128]-bucket re-dispatch
    # (restart segments are independent, so a starved lane just
    # re-decodes alone), budgets can hug the prediction.  Starvation
    # rate measured against the OTHER frames' actuals per segment.
    actual_chunk = per_seg[:CHUNK]  # [CHUNK, spf] true steps
    for mult, add in ((1.15, 16), (1.05, 8), (1.0, 8), (1.0, 4), (1.0, 2)):
        pred_t = (per_seg.max(axis=0) * mult).astype(np.int64) + add
        lanes_t = np.repeat(np.sort(pred_t)[::-1], CHUNK)
        for divs, q in (((2, 4, 16), 32),
                        (tuple(np.unique(np.geomspace(1.2, 120, 24
                                                      ).astype(int))), 8)):
            ph = phases_from(lanes_t, S, int(pred_t.max()) + 32, divs, q)
            att = sum(n * t for n, t in ph)
            # a lane starves when its phase budget (its predicted rank's
            # cumulative bound) is below its actual steps
            bound_of_rank = np.empty(S, np.int64)
            acc = 0
            lo = S
            for n, t in ph:
                acc += t
                bound_of_rank[:n] = acc
            order = np.argsort(pred_t)[::-1]
            bound_seg = np.empty(spf, np.int64)
            bound_seg[order] = bound_of_rank[::CHUNK][
                np.arange(spf)
            ]  # rank-major: rank i covers segs order[i]
            starve = (actual_chunk > bound_seg[None, :]).sum()
            print(f"slack x{mult}+{add} divs={len(ph)}ph q{q}: "
                  f"attempts={att} ratio={att/true_total:.3f} "
                  f"starved={starve}/{S}")


if __name__ == "__main__":
    main()
