"""Spatial-split (SBVH-style pre-split references) vs plain binned SAH —
does tree quality move the straggler WALK? (round-4 VERDICT item 2)

The ceiling model says rounds track the straggler packet's walk, the one
quantity every round-3 reschedule conserved (BASELINE.md). Spatial splits
are the canonical tree-quality lever: reference-duplicate big/diagonal
triangles with clipped boxes so SAH can carve tighter nodes
(bvh.presplit_refs; exact intersection preserved — leaves store original
triangles). This probe measures, on the exact c3 bounce-1 workload
(131072 post-bounce rays, blob subdiv-6, 81920 tris) and on primaries:

  * rounds / adv_steps / sum_pp counters + isolated wall
    (device_time_fused) for presplit alpha in {0, 0.25, 0.5, 1.0};
  * ref counts and build time per alpha.

Run on the TPU; one JSON line per point. Numbers + verdict appended
below after each run (the probe discipline).

RESULTS (2026-08-18, two runs, post-fusion-surgery b7f5e4b):

Run 1 (production threshold, SA > 2x median): the pass is a NO-OP on
the blob — identical trees at every alpha (pk_nodes 3695, leaf rows
3696) because the mesh is uniform: max/median reference-box SA is 1.66
(measured inline below the probe), so no reference ever qualifies.
bounce-1 9.55-9.59 ms, rounds 124 at every alpha — pure noise.

Run 2 (threshold forced to 0 so the budget is actually spent —
bvh.PRESPLIT_THRESHOLD):
    alpha  leaf_rows  bounce1_ms  rounds  adv_steps  sum_pp
    0.0      3696       9.459      124      992      32208
    0.25     4518      10.083      130     1040      32272
    0.5      5454      10.064      135     1080      34272
    1.0      7378      11.273      155     1240      36176
    primaries: 1.502 -> 1.644 -> 1.824 -> 1.901 ms (monotone loss)

VERDICT: REFUTED on this mesh class, from both directions. With the
production gate the pass correctly never fires (no oversized refs
exist to split); with the gate forced off, every unit of budget makes
the tree DEEPER (nodes +22%/ref at alpha 1.0) and the straggler walk
LONGER (rounds 124 -> 155, +25%) — spatial splits pay only where
oversized/diagonal references inflate node overlap, and a uniform
closed tessellation has none. The walk is a property of the per-packet
ray-footprint union, not of SAH topology quality (consistent with
probe_sahbins: 16 bins already saturate). PRESPLIT_ALPHA stays 0.0 for
the built-ins; the pass + tests stay for OBJ imports with sliver/
oversized triangles, where the 2x-median gate will fire and the clipped
boxes are the textbook win. Tree quality on the blob is now CLOSED
(bins saturated, spatial splits counterproductive, 8-ary and 4-ary
fanouts each refuted end-to-end).
"""

from __future__ import annotations

import sys as _sys
import time
from pathlib import Path as _Path
_sys.path[:0] = [str(_Path(__file__).resolve().parent.parent),
                 str(_Path(__file__).resolve().parent)]
import json

import jax
import jax.numpy as jnp

from microbench import device_time_fused

from tpurt import bvh, camera as camera_mod
from tpurt import config, materials, rng, trace
from tpurt import render
from tpurt.kernels import traverse

N = 131072


def main() -> None:
    cfg = config.RenderConfig(width=1280, height=720, spp=4, scene="blob",
                              mesh_subdiv=6, mode="mega", max_depth=8)
    scene, cam = config.build_scene(cfg)
    scene = scene.device()

    order_full = render.tile_order(cfg.width, cfg.height)
    n_tiles = order_full.size // 128
    step = n_tiles // (N // 128)
    order = order_full.reshape(n_tiles, 128)[::step][: N // 128].reshape(-1)
    pix = jnp.asarray(order)
    keys = rng.make_streams(jnp.uint32(0), pix, jnp.zeros(N, jnp.int32))
    jit2 = rng.camera_draws(keys)
    o, d = camera_mod.generate_rays(cam, cfg.width, cfg.height, pix, jit2)

    @jax.jit
    def one_bounce(o, d, keys):
        h = trace.intersect(scene, o, d)
        mp = scene.mat_packed[h.mat]
        mtype = jax.lax.bitcast_convert_type(mp[:, 0], jnp.int32)
        draws = rng.bounce_draws(keys, jnp.int32(0))
        nd, _, alive = materials.scatter(
            d, h.n, h.front, mtype, mp[:, 1:4], mp[:, 7], mp[:, 8], draws)
        p = o + h.t[:, None] * d
        return jnp.where(h.ok[:, None], p, o), nd, h.ok & alive

    o2, d2, alive2 = jax.block_until_ready(one_bounce(o, d, keys))
    tcap2 = jnp.where(alive2, jnp.inf, 0.0)
    tinf = jnp.full(N, jnp.inf, jnp.float32)

    def run(name, sc, rays, iters=16):
        trav = jax.jit(lambda o, d, t: traverse.packet_nearest_tri(
            sc, o, d, t)[0])
        sec = device_time_fused(trav, *rays, iters=iters)
        cnt = jax.jit(lambda o, d, t: traverse.packet_nearest_tri(
            sc, o, d, t, with_counters=True)[5:9])
        r, a, s_pp, s_pend = (int(x) for x in cnt(*rays))
        print(json.dumps({"probe": name, "ms": round(sec * 1e3, 3),
                          "rounds": r, "adv_steps": a, "sum_pp": s_pp,
                          "sum_pending": s_pend}), flush=True)

    # threshold=0 forces the split budget to be spent even on uniform
    # meshes (run 1 found the production 2x-median gate makes the pass a
    # no-op on the blob: max/median box SA is 1.66 — see RESULTS)
    for alpha, thr in ((0.0, 2.0), (0.25, 0.0), (0.5, 0.0), (1.0, 0.0)):
        t0 = time.time()
        old = (bvh.PRESPLIT_ALPHA, bvh.PRESPLIT_THRESHOLD)
        bvh.PRESPLIT_ALPHA = alpha
        bvh.PRESPLIT_THRESHOLD = thr
        try:
            sc_a, _ = config.build_scene(cfg)
        finally:
            bvh.PRESPLIT_ALPHA, bvh.PRESPLIT_THRESHOLD = old
        sc_a = sc_a.device()
        build_s = time.time() - t0
        print(json.dumps({"alpha": alpha, "build_s": round(build_s, 2),
                          "pk_leaf_rows": int(sc_a.pk_leaves.shape[0]),
                          "pk_nodes": int(sc_a.pk_nodes.shape[0])}),
              flush=True)
        run(f"bounce1_alpha{alpha}", sc_a, (o2, d2, tcap2))
        run(f"primary_alpha{alpha}", sc_a, (o, d, tinf))


if __name__ == "__main__":
    main()
