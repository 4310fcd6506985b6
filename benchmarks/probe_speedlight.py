"""Mrays/s vs triangle count at contract spp (round-5 VERDICT item 5).

The north star (BASELINE.json: >= 100 Mrays/s/chip on "a BVH triangle
scene") does not fix the triangle count; the contract c3 scene is the
81,920-tri blob. The per-ray work is the per-packet footprint union,
which grows with tree depth ~log(tris) in rounds and with leaf volume
in the dense phase — so throughput vs tris is the measured curve that
states FOR WHICH SCENE CLASS the north star is reachable on this
chip+runtime. Protocol: c3-mesh contract preset (1280x720, 128 spp,
mega, depth 8) with mesh_subdiv swept 4..7 (5120 / 20480 / 81920 /
327680 tris), warmup excluded, best of 2 timed passes per point, all
in one process (programs differ by tree-array shapes only).

MEASURED (TPU v5e via axon relay, 2026-08-19, shipped defaults,
OCT_ENABLE=True; actual tri counts include the blob's base geometry):

    subdiv  tris     wall_s   Mrays/s
    4        6,592   22.775   12.423
    5       26,072   29.347    9.641
    6      104,672   34.150    8.285   (the contract c3 point)
    7      419,828   42.434    6.668

VERDICT: throughput is remarkably FLAT in scene size — 64x the
triangles costs only 1.86x (the walk grows ~log tris and leaf volume
saturates the per-round cost only slowly). Two readings: (a) the
framework scales to production scene sizes gracefully — c3 at 420k
tris still sustains 6.7 Mrays/s; (b) the north star is NOT reachable
on ANY triangle scene by shrinking the tree: even at 6.6k tris the
frame only reaches 12.4 Mrays/s. Extrapolating the curve leftward, a
zero-triangle c3 bounce workload would sit near ~13-14 Mrays/s — that
is the tree-independent part of the program's cost (bounce bodies,
RNG, materials, film machinery) priced directly. [Correction, same
session: the first draft of this verdict also cited probe_stagewalls'
"traversal is ~24 of 133 ms/batch" to claim most of the wall was
non-traversal; probe_hostchain.py refuted that reading — the 24 ms was
measured on the frame's CHEAPEST batch (block 0, sky half). The curve
above is unaffected: it is full-frame end-to-end at every point.] The
speed-of-light table (BASELINE.md round-5) uses this curve as the
tree-volume axis.
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

SUBDIVS = (4, 5, 6, 7)


def main() -> None:
    for sd in SUBDIVS:
        cfg = config.PRESETS["c3-mesh"].replace(mesh_subdiv=sd)
        scene, cam = config.build_scene(cfg)
        ntris = int(scene.tri_v0.shape[0])
        scene = scene.device()
        film, _ = render.render_samples(cfg, scene, cam, 0, 1)
        float(jnp.sum(film))
        best, rays = float("inf"), 0
        for _ in range(2):
            t0 = time.perf_counter()
            film, rays = render.render_samples(
                cfg, scene, cam, 1, 1 + cfg.spp, jnp.zeros_like(film))
            float(jnp.sum(film))
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({
            "probe": "tris_curve", "subdiv": sd, "tris": ntris,
            "wall_s": round(best, 3), "rays": int(rays),
            "mrays_per_s": round(rays / best / 1e6, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
