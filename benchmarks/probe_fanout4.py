"""Fanout-4 ("grandchildren") CIP traversal vs binary on the c3 workload.

Round-4 follow-up to probe_fanout.py (8-ary, REFUTED): the 8-ary point
paid +50% box-test volume per round and was leaf-drain-gated, so its 3x
link cut never showed. Fanout 4 is the volume-neutral point: each visit
tests the FOUR boxes two binary levels down — exactly the boxes two
binary steps test — with HALF the gather->reduce->epilogue links per
level. The binary stage-0 regime is walk-gated (rounds = straggler walk
/ ADV: 992/8 = 124 measured), so pk4's ~half-length walk should also
halve rounds until the leaf-drain floor (~straggler leaf count / D)
takes over; DRAIN_N[2] in {1, 2} probes that floor.

Grid: ADV_STEPS_WIDE4 x DRAIN_N(full-width), bounce-1 (131072 divergent
rays) + primaries, wall via device_time_fused + round counters.

Run on the TPU; one JSON line per point. Numbers + verdict appended
below after each run (the probe discipline).

RESULTS (2026-08-18, run after the fusion-surgery commit b7f5e4b):
  pk4_nodes 1439 vs binary 3695; leaf_rows identical (3696).
  binary adv8:      bounce-1 9.593 ms (124 rounds, 992 adv_steps,
                    sum_pp 32208); primaries 1.677 ms.
  pk4 best (adv4, d1): 9.542 ms (134 rounds, 536 adv_steps, sum_pp
                    34784); the full d1/d2 x adv{3,4,5,6,8} grid spans
                    9.54-11.95 ms — every point >= binary minus noise.
  pk4 primaries (adv5): 1.599 ms vs 1.677 (-4.7%, ~0.08 ms absolute).

VERDICT: REFUTED (tie). The link cut is real (536 vs 992 adv steps at
the best point) but phase A post-surgery is no longer link-dominated
enough for halving levels to pay: pk4's wider rows make each adv step
~2x the work (4 box tests + 4-way ring push vs 2), so wall is conserved
— the same conservation law probe_advstage found for schedule changes
now holds for arity too. Round count UP at the best point (134 vs 124:
shallower tree but the drain floor and ragged walks dominate). The ~5%
primary win is too small to carry a third tree build + upload.
WIDE_ENABLE stays False; fanout=4 layout + tests kept for re-probing if
the drain floor ever moves.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path[:0] = [str(_Path(__file__).resolve().parent.parent),
                 str(_Path(__file__).resolve().parent)]
import json

import jax
import jax.numpy as jnp
import numpy as np

from microbench import device_time_fused

from tpurt import bvh, camera as camera_mod
from tpurt import config, materials, meshgen, rng, scene as scene_mod, trace
from tpurt import render
from tpurt.kernels import traverse

N = 131072


def main() -> None:
    cfg = config.RenderConfig(width=1280, height=720, spp=4, scene="blob",
                              mesh_subdiv=6, mode="mega", max_depth=8)
    scene, cam = config.build_scene(cfg)

    # pk4 over the same mesh triangles/materials the scene build used
    v, f = meshgen.blob(subdiv=cfg.mesh_subdiv)
    sc_probe, _ = scene_mod.mesh_scene(cfg.aspect, v, f)
    # recover original mesh soup + material ids via a builder replay
    fa = np.asarray(f, np.int64)
    v32 = np.asarray(v, np.float32)
    v0, v1, v2 = v32[fa[:, 0]], v32[fa[:, 1]], v32[fa[:, 2]]
    mats = np.full(fa.shape[0], 1, np.int32)  # mesh body material id
    pk4 = bvh.build_packet8(v0, v1, v2, mats, fanout=4)
    print(json.dumps({"pk4_nodes": int(pk4.nodes.shape[0]),
                      "pk_nodes_binary": int(scene.pk_nodes.shape[0]),
                      "leaf_rows": int(pk4.leaves.shape[0])}), flush=True)

    scene = scene.device()
    scene4 = scene._replace(pk8_nodes=jax.device_put(pk4.nodes),
                            pk8_leaves=jax.device_put(pk4.leaves),
                            pk8_cut=jax.device_put(pk4.cut))

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

    run("bounce1_binary_adv8", scene, (o2, d2, tcap2))
    run("primary_binary_adv8", scene, (o, d, tinf))

    traverse.WIDE_ENABLE = True
    old_drain = traverse.DRAIN_N
    try:
        for full_d in (1, 2):
            traverse.DRAIN_N = (4, 2, full_d)
            for adv in (3, 4, 5, 6, 8):
                traverse.ADV_STEPS_WIDE4 = adv
                run(f"bounce1_pk4_adv{adv}_d{full_d}", scene4,
                    (o2, d2, tcap2))
        traverse.DRAIN_N = old_drain
        traverse.ADV_STEPS_WIDE4 = 5
        run("primary_pk4_adv5_d1", scene4, (o, d, tinf))
    finally:
        traverse.WIDE_ENABLE = False
        traverse.DRAIN_N = old_drain


if __name__ == "__main__":
    main()
