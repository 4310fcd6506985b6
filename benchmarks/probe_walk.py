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

    for alpha in (0.0, 0.25, 0.5, 1.0):
        t0 = time.time()
        old = bvh.PRESPLIT_ALPHA
        bvh.PRESPLIT_ALPHA = alpha
        try:
            sc_a, _ = config.build_scene(cfg)
        finally:
            bvh.PRESPLIT_ALPHA = old
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
