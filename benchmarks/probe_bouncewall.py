"""Bounce-resolved wall attribution of the c3 CONTRACT frame (round-5
VERDICT item 3).

Method: render the full c3 contract workload (1280x720, 128 spp, blob
subdiv-6, mega) at max_depth = 1, 2, 3, 4, 6, 8 — one jit program per
depth, warmup excluded, best of 2 timed passes — and difference the
walls. wall(d) - wall(d-1) is the marginal cost of bounce d-1 (its
traversal + material + RNG work; the film epilogue is depth-invariant
and cancels). This is the contract-scale counterpart of the round-3
strided profile, with zero trace-parsing machinery; rays(d) deltas
give the live-ray count entering each bounce, so every increment also
yields a marginal ns/ray.

The question this answers (BASELINE.md ceiling model): how much of the
contract frame is the deep-bounce tail (bounces 4+), and did octant —
which cut primaries 24% — move it at all? If the tail share is still
~half the frame at 128 spp, the next attack must target narrow-width
round floors specifically; if it has shrunk, the fresh-bounce volume
is again the target.

MEASURED (TPU v5e via axon relay, 2026-08-19, best-of-2 full-frame
passes; shipped defaults, OCT_ENABLE=True):

    depth   wall_s   rays        | marginal  wall_s  rays     ns/ray  share
    1       4.807    117.96M     | b1        9.184   101.8M    90.2   26.9%
    2      13.992    219.77M     | b2        6.518    33.7M   193.5   19.1%
    3      20.510    253.45M     | b3        4.909    17.3M   283.0   14.4%
    4      25.418    270.79M     | b4-5      5.558     8.9M   621.6   16.3%
    6      30.976    279.73M     | b6-7      3.173     3.2M   990.7    9.3%
    8      34.149    282.94M     | (depth-1 base = 14.1%)

VERDICT: the deep tail (bounces 4-7) is 25.6% of the contract frame —
real but NOT the half the round-3 strided profile suggested; bounce 1
alone is the largest marginal term (26.9%), and marginal ns/ray grows
11x from bounce 1 to bounces 6-7 (any-live packet width decays far
slower than ray liveness). Octant did move the tail: shares are
front-loaded vs round 3's 28% for 4+. The decisive cross-reference:
the bounce-1 marginal is 9.184 s / 256 batches = 35.9 ms per 512k
batch, while probe_stagewalls measures the ISOLATED traversal of the
same real survivor set at 7.6 ms — the frame pays a ~4x IN-CONTEXT
multiplier on top of the traversal volume integral. Localizing that
multiplier (trace's loop machinery vs _accum_frame's fori nest) is
probe_context.py.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path[:0] = [str(_Path(__file__).resolve().parent.parent),
                 str(_Path(__file__).resolve().parent)]
import json
import time

import jax.numpy as jnp

from tpurt import config, render

DEPTHS = (1, 2, 3, 4, 6, 8)


def main() -> None:
    cfg0 = config.PRESETS["c3-mesh"]
    scene, cam = config.build_scene(cfg0)
    scene = scene.device()

    rows = []
    for d in DEPTHS:
        cfg = cfg0.replace(max_depth=d)
        film, _ = render.render_samples(cfg, scene, cam, 0, 1)  # warm
        float(jnp.sum(film))
        best = float("inf")
        rays = 0
        for _ in range(2):
            t0 = time.perf_counter()
            film, rays = render.render_samples(
                cfg, scene, cam, 1, 1 + cfg.spp, jnp.zeros_like(film))
            float(jnp.sum(film))
            best = min(best, time.perf_counter() - t0)
        rows.append((d, best, int(rays)))
        print(json.dumps({"probe": "depth", "max_depth": d,
                          "wall_s": round(best, 3), "rays": int(rays)}),
              flush=True)

    for (d0, w0, r0), (d1, w1, r1) in zip(rows, rows[1:]):
        dr = r1 - r0
        dw = w1 - w0
        print(json.dumps({
            "probe": "marginal", "bounces": f"{d0}..{d1 - 1}",
            "wall_s": round(dw, 3), "rays": dr,
            "ns_per_ray": round(dw / max(dr, 1) * 1e9, 1),
            "share_of_depth8": round(dw / rows[-1][1], 4),
        }), flush=True)


if __name__ == "__main__":
    main()
